#!/usr/bin/env python
"""Secondary benchmark: real block-sparse conv execution vs dense.

Times the DRN-D-22 layer-6-shaped conv (3x3, 512->512, dilation 2, at the
stride-8 resolution of a 1024x2048 frame) three ways:

- dense XLA conv
- masked dense (the reference's simulated sparsity — identical cost to dense)
- tpuseg sparse lowering (per-tap column-block-sparse Pallas matmuls)

with a coarse-block magnitude mask (BlockPruner geometry 128x128) at 50/75/
87.5% sparsity.  Prints one JSON line per configuration.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpuseg.models.drn import conv2d
    from tpuseg.ops.sparse_conv import plan_sparse_conv, sparse_conv_apply
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    N, H, W, C = 1, 128, 256, 512
    K = 3
    DIL = 2
    INNER = 50

    rng = np.random.default_rng(0)
    w = rng.normal(size=(K, K, C, C)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def timeit(one_fn, reps=3):
        @jax.jit
        def loop(x):
            def body(xc, _):
                y = one_fn(xc)
                xc = xc + y[:, :1, :1, :].astype(xc.dtype) * 1e-6
                return xc, y[0, 0, 0, 0]

            _, probes = jax.lax.scan(body, x, None, length=INNER)
            return probes.astype(jnp.float32).sum()

        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    wd = jnp.asarray(w).astype(jnp.bfloat16)
    t_dense = timeit(lambda xx: conv2d(xx, wd, 1, DIL, DIL))
    print(json.dumps({"metric": "dense_conv3x3_ms", "value": round(t_dense * 1e3, 3)}))

    # ---- 1x1 (matmul-shaped) case: seg-head / downsample / bottleneck convs
    w1 = rng.normal(size=(1, 1, C, C)).astype(np.float32) * 0.05
    w1d = jnp.asarray(w1).astype(jnp.bfloat16)
    t1_dense = timeit(lambda xx: conv2d(xx, w1d, 1, 1, 0))
    print(json.dumps({"metric": "dense_conv1x1_ms", "value": round(t1_dense * 1e3, 3)}))
    for sparsity in [0.5, 0.75, 0.875]:
        w1_oihw = np.transpose(w1, (3, 2, 0, 1))
        m1 = prune_as_block(
            w1_oihw, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
        )
        mask1 = np.transpose(m1, (2, 3, 1, 0))
        plan1 = plan_sparse_conv(w1, mask1)
        t1 = timeit(lambda xx, p=plan1: sparse_conv_apply(xx, p, dilation=1, bp=4096))
        print(json.dumps({
            "metric": f"sparse_conv1x1_{int(sparsity*1000)/10}pct",
            "block_density": round(plan1.density, 4),
            "ms": round(t1 * 1e3, 3),
            "speedup_vs_dense": round(t1_dense / t1, 3),
        }))

    for sparsity in [0.5, 0.75, 0.875]:
        # OIHW-view magnitude block mask with MXU-sized blocks, then to HWIO
        w_oihw = np.transpose(w, (3, 2, 0, 1))
        mask_oihw = prune_as_block(
            w_oihw, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
        )
        mask = np.transpose(mask_oihw, (2, 3, 1, 0))
        plan = plan_sparse_conv(w, mask)
        t_sparse = timeit(lambda xx, p=plan: sparse_conv_apply(xx, p, dilation=DIL))
        print(
            json.dumps(
                {
                    "metric": f"sparse_conv_{int(sparsity*1000)/10}pct",
                    "block_density": round(plan.density, 4),
                    "ms": round(t_sparse * 1e3, 3),
                    "speedup_vs_dense": round(t_dense / t_sparse, 3),
                }
            )
        )




def bench_fused():
    import jax
    import jax.numpy as jnp

    from tpuseg.models.drn import conv2d
    from tpuseg.ops.sparse_conv import fused_sparse_conv_apply, plan_fused_sparse_conv
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    N, H, W, C = 1, 128, 256, 512
    K, DIL = 3, 2
    INNER = 50
    rng = np.random.default_rng(0)
    w = rng.normal(size=(K, K, C, C)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

    def timeit(one_fn, reps=3):
        @jax.jit
        def loop(x):
            def body(xc, _):
                y = one_fn(xc)
                xc = xc + y[:, :1, :1, :].astype(xc.dtype) * 1e-6
                return xc, y[0, 0, 0, 0]
            _, probes = jax.lax.scan(body, x, None, length=INNER)
            return probes.astype(jnp.float32).sum()
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    wd = jnp.asarray(w).astype(jnp.bfloat16)
    t_dense = timeit(lambda xx: conv2d(xx, wd, 1, DIL, DIL))
    print(json.dumps({"metric": "fused/dense_conv3x3_ms", "value": round(t_dense * 1e3, 3)}))
    for sparsity in [0.5, 0.75, 0.875]:
        w_oihw = np.transpose(w, (3, 2, 0, 1))
        mask_oihw = prune_as_block(
            w_oihw, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
        )
        mask = np.transpose(mask_oihw, (2, 3, 1, 0))
        plan = plan_fused_sparse_conv(w, mask, dilation=DIL)
        t = timeit(lambda xx, p=plan: fused_sparse_conv_apply(xx, p, rows_per_tile=4))
        print(json.dumps({
            "metric": f"fused_sparse_conv_{int(sparsity*1000)/10}pct",
            "block_density": round(plan.block_density, 4),
            "ms": round(t * 1e3, 3),
            "speedup_vs_dense": round(t_dense / t, 3),
        }))


if __name__ == "__main__":
    import sys

    if "--fused-only" not in sys.argv:
        main()
    if "--fused" in sys.argv or "--fused-only" in sys.argv or "--fused-appendix" in sys.argv:
        bench_fused()
