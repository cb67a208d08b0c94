#!/usr/bin/env python
"""Round-5 probe: WHERE does DRN-D-54's sparse-serving win go?

d22/d38 serve at ~1.5x with block128reg 87.5% masks, but d54 (bottleneck
blocks — wide 1x1 convs carry most FLOPs) measured only 1.18x
(runs/hw_r05b).  This decomposes the gathered-exact win by conv class in
ONE session: dense / all 35 plans / 3x3-conv plans only / 1x1-conv plans
only.  If the 1x1 class is flat or negative, the fix is an eligibility
rule (gather traffic vs compute is worst for kh=kw=1); if both classes
win alone but not together, it's a memory/fusion interaction.

Usage: timeout 2400 python -u scripts/r5_d54_decomp.py
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
CFG = f"optimal_configs/{ARCH}/{ARCH}_block128reg_87.50.json"
H, W, BATCH = 1024, 2048, 8
MEAN, STD = [0.29, 0.33, 0.29], [0.18, 0.19, 0.18]


def main():
    params, state, spec = init_drnseg(0, ARCH, 19)
    masker = create_masker(CFG, seed=0)
    masks = masker.generate_masks(params, is_static=True, verbose=False)
    params = dict(apply_masks(params, masks))
    folded = fold_bn(params, state, spec)
    plans, _ = build_sparse_plans(
        folded, masks, spec, lowering="gathered", gathered_mode="exact")

    def ksize(name):
        return int(np.asarray(params[name + ".weight"]).shape[0])

    subsets = {
        "dense": None,
        "all35": plans,
        "only3x3": {n: p for n, p in plans.items() if ksize(n) == 3},
        "only1x1": {n: p for n, p in plans.items() if ksize(n) == 1},
        # density bands within the 1x1 class: does the gather pay at 1/8?
        "only1x1_d125": {n: p for n, p in plans.items()
                         if ksize(n) == 1 and p.block_density <= 0.13},
        "only1x1_d25": {n: p for n, p in plans.items()
                        if ksize(n) == 1 and 0.13 < p.block_density <= 0.3},
        "only1x1_d50": {n: p for n, p in plans.items()
                        if ksize(n) == 1 and p.block_density > 0.3},
    }
    rows = []
    for name, ep in subsets.items():
        seg = VideoSegmenter(params, state, spec, MEAN, STD,
                             batch=BATCH, exec_plans=ep)
        t0 = time.time()
        fps = seg.benchmark_device_fps((H, W))
        row = {"subset": name, "n_plans": len(ep or {}),
               "device_fps": round(fps, 2),
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    dense = next(r["device_fps"] for r in rows if r["subset"] == "dense")
    print(json.dumps({"probe": "d54_decomp", "arch": ARCH, "batch": BATCH,
                      "ratios": {r["subset"]:
                                 round(r["device_fps"] / dense, 3)
                                 for r in rows}}), flush=True)


if __name__ == "__main__":
    main()
