#!/usr/bin/env python
"""Round-5 probe: does the serving-side 1x1 finding transfer to the
TRAINER's sparse-exec path on a bottleneck arch?

Serving's gathered lowering loses on 1x1 convs (gather re-materializes
activations in HBM with no tap loop to amortize it — PERF_NOTES round 5).
The trainer's Pallas fused kernel has different physics (tiles stream
through VMEM windows; no gathered activation copy), so the rule must NOT
be copied blindly.  This times the FULL d54 train step (bench_sparse
--trainer harness) three ways in one session: dense-masked, sparse-exec
with every eligible struct (24 of them 1x1), sparse-exec with 3x3
structs only.

Usage: timeout 2400 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r5_d54_train_probe.py
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import init_drnseg
from tpuseg.ops.sparse_train import build_sparse_train_structs
from tpuseg.sparsity import create_masker
from tpuseg.train import create_train_state, make_seg_train_step, make_sgd

ARCH, CROP, BATCH, INNER = "drn_d_54", 512, 4, 16


def main():
    cfg = os.path.join("optimal_configs", ARCH,
                       f"{ARCH}_block128reg_87.50.json")
    params, state, spec = init_drnseg(0, ARCH, 19)
    masker = create_masker(cfg, seed=0)
    masks = masker.generate_masks(params, is_static=True)
    structs, report = build_sparse_train_structs(masks, spec)

    def k(name):
        return int(np.asarray(params[name + ".weight"]).shape[0])

    s3 = {n: s for n, s in structs.items() if k(n) == 3}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, CROP, CROP, 3), dtype=np.float32))
    y = jnp.asarray(
        rng.integers(0, 19, size=(BATCH, CROP, CROP)).astype(np.int32))
    tx = make_sgd(lambda _: 0.01, 0.9, 1e-4)

    def time_step(plans):
        step = make_seg_train_step(
            spec, tx, compute_dtype=jnp.bfloat16, sparse_plans=plans)

        @jax.jit
        def loop(ts):
            def body(c, _):
                c2, _m = step(c, x, y)
                return c2, ()
            ts2, _ = jax.lax.scan(body, ts, None, length=INNER)
            return ts2

        ts = create_train_state(params, state, tx, masks)
        o = loop(ts)
        float(np.asarray(o.params["seg.weight"]).sum())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = loop(ts)
            float(np.asarray(o.params["seg.weight"]).sum())
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    rows = {}
    for name, plans in [("dense_masked", None),
                        (f"sparse_all{len(structs)}", structs),
                        (f"sparse_3x3only{len(s3)}", s3)]:
        t = time_step(plans)
        rows[name] = round(t * 1e3, 2)
        print(json.dumps({"variant": name, "ms": rows[name]}), flush=True)
    base = rows["dense_masked"]
    print(json.dumps({
        "probe": "d54_train_sparse_exec", "arch": ARCH,
        "crop": CROP, "batch": BATCH, "ms": rows,
        "speedups": {n: round(base / v, 3) for n, v in rows.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
