#!/usr/bin/env python
"""Round-5 probe v3: validate the 1x1 gathered eligibility rule as the
COMPOSED plan sets a user would actually serve (bands compose
sub-additively — only1x1=0.92x though its bands measure 1.10/1.01/0.95,
so per-band wins do not certify the composition).

Candidate rule: a 1x1 conv lowers via gathered-exact only if its block
density <= 0.13 OR it has dead out-blocks (exact mode skips those for
free).  Measured sets, one session, shared dense sibling:
  reg_only3x3  — strict rule (no 1x1 at all) on block128reg
  reg_rule     — candidate rule on block128reg
  raw_all      — status quo on raw block128 (dead-block heavy)
  raw_rule     — candidate rule on raw block128
Usage: timeout 2400 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r5_d54_decomp3.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import init_drnseg
from tpuseg.models.sparse_exec import build_sparse_plans
from tpuseg.ops.fold_bn import fold_bn
from tpuseg.sparsity import apply_masks, create_masker
from tpuseg.video import VideoSegmenter

ARCH = "drn_d_54"
H, W, BATCH = 1024, 2048, 8
MEAN, STD = [0.29, 0.33, 0.29], [0.18, 0.19, 0.18]


def build(cfg_name):
    params, state, spec = init_drnseg(0, ARCH, 19)
    cfg = f"optimal_configs/{ARCH}/{ARCH}_{cfg_name}_87.50.json"
    masker = create_masker(cfg, seed=0)
    masks = masker.generate_masks(params, is_static=True, verbose=False)
    params = dict(apply_masks(params, masks))
    folded = fold_bn(params, state, spec)
    plans, _ = build_sparse_plans(
        folded, masks, spec, lowering="gathered", gathered_mode="exact")
    return params, state, spec, plans


def ksize(params, name):
    return int(np.asarray(params[name + ".weight"]).shape[0])


def rule(params, plans):
    from tpuseg.ops.gathered_conv import GatheredGroupConv

    out = {}
    for n, p in plans.items():
        if not isinstance(p, GatheredGroupConv) or ksize(params, n) == 3:
            out[n] = p  # structured (RBGP) lowerings are untouched
        elif p.block_density <= 0.13 or any(len(ks) == 0 for ks in p.idx):
            out[n] = p
    return out


def main():
    reg = build("block128reg")
    raw = build("block128")
    jobs = [
        ("dense", reg, None),
        ("reg_only3x3", reg,
         {n: p for n, p in reg[3].items() if ksize(reg[0], n) == 3}),
        ("reg_rule", reg, rule(reg[0], reg[3])),
        ("raw_all", raw, raw[3]),
        ("raw_rule", raw, rule(raw[0], raw[3])),
    ]
    rows = []
    for name, (params, state, spec, _), ep in jobs:
        seg = VideoSegmenter(params, state, spec, MEAN, STD,
                             batch=BATCH, exec_plans=ep)
        t0 = time.time()
        fps = seg.benchmark_device_fps((H, W))
        row = {"subset": name, "n_plans": len(ep or {}),
               "device_fps": round(fps, 2),
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    dense = rows[0]["device_fps"]
    print(json.dumps({"probe": "d54_rule", "arch": ARCH, "batch": BATCH,
                      "ratios": {r["subset"]:
                                 round(r["device_fps"] / dense, 3)
                                 for r in rows}}), flush=True)


if __name__ == "__main__":
    main()
