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
        # full-output chaining — see the DCE note in bench_fused.timeit
        @jax.jit
        def loop(x):
            def body(xc, _):
                return one_fn(xc).astype(xc.dtype), ()

            y, _ = jax.lax.scan(body, x, None, length=INNER)
            return y[0, 0, 0, 0].astype(jnp.float32)

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
        # The FULL output must feed the next iteration: probing a slice of
        # y lets XLA dead-code-eliminate most of a dense conv (it computes
        # only the probed pixels), silently deflating the dense baseline —
        # measured 0.17 ms/frame "dense" vs 1.06 honest at the layer-6
        # shape.  Pallas calls are opaque to that rewrite, so a sliced
        # probe biases dense-vs-sparse comparisons in sparse's favor.
        @jax.jit
        def loop(x):
            def body(xc, _):
                return one_fn(xc).astype(xc.dtype), ()
            y, _ = jax.lax.scan(body, x, None, length=INNER)
            return y[0, 0, 0, 0].astype(jnp.float32)
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
        from tpuseg.ops.sparse_conv import (
            fused_sparse_conv_apply_q,
            quantize_fused_plan,
        )

        qplan = quantize_fused_plan(plan, x_scale=0.05)
        tq = timeit(lambda xx, p=qplan: fused_sparse_conv_apply_q(
            xx, p, rows_per_tile=4))
        # round-3 phase-shifted kernel (dx pre-shift in HBM, free H slices,
        # per-tap f32 accumulation — no xmat concat)
        from tpuseg.ops.sparse_conv import (
            phase_sparse_conv_apply,
            plan_shared_sparse_conv,
        )

        sh_plan = plan_shared_sparse_conv(w, mask, dilation=DIL)
        tp, tp_rpt = 1e9, 0
        for rpt in (4, 8, 16):
            try:
                tt = timeit(lambda xx, p=sh_plan, r=rpt:
                            phase_sparse_conv_apply(xx, p, rows_per_tile=r))
            except AssertionError:
                continue
            if tt < tp:
                tp, tp_rpt = tt, rpt
        # per-out-block phase variant: per-column density AND no shuffles
        from tpuseg.ops.sparse_conv import fused_phase_sparse_conv_apply

        tfp, tfp_rpt = 1e9, 0
        for rpt in (4, 8, 16, 32):
            try:
                tt = timeit(lambda xx, p=plan, r=rpt:
                            fused_phase_sparse_conv_apply(
                                xx, p, rows_per_tile=r))
            except AssertionError:
                continue
            if tt < tfp:
                tfp, tfp_rpt = tt, rpt
        # direct-DMA im2col variant: single big dot, zero shuffles
        from tpuseg.ops.sparse_conv import imcol_phase_sparse_conv_apply

        tic, tic_rpt = 1e9, 0
        for rpt in (4, 8, 16):
            try:
                tt = timeit(lambda xx, p=plan, r=rpt:
                            imcol_phase_sparse_conv_apply(
                                xx, p, rows_per_tile=r))
            except AssertionError:
                continue
            if tt < tic:
                tic, tic_rpt = tt, rpt
        # phase pre-shift + ALIGNED concat + one dot (relayout-free copies)
        from tpuseg.ops.sparse_conv import cphase_sparse_conv_apply

        tcp, tcp_rpt = 1e9, 0
        for rpt in (4, 8, 16):
            try:
                tt = timeit(lambda xx, p=plan, r=rpt:
                            cphase_sparse_conv_apply(xx, p, rows_per_tile=r))
            except AssertionError:
                continue
            if tt < tcp:
                tcp, tcp_rpt = tt, rpt
        # shared-union xmat + single wide dot (shuffle amortized over
        # out-blocks, compute at union density)
        from tpuseg.ops.sparse_conv import shared_concat_sparse_conv_apply

        tsc, tsc_cfg = 1e9, (0, 0)
        for rpt in (4, 8):
            for osp in (1, 2, 4):
                try:
                    tt = timeit(lambda xx, p=sh_plan, r=rpt, o=osp:
                                shared_concat_sparse_conv_apply(
                                    xx, p, rows_per_tile=r, out_split=o))
                except AssertionError:
                    continue
                if tt < tsc:
                    tsc, tsc_cfg = tt, (rpt, osp)
        print(json.dumps({
            "metric": f"fused_sparse_conv_{int(sparsity*1000)/10}pct",
            "block_density": round(plan.block_density, 4),
            "ms": round(t * 1e3, 3),
            "int8_ms": round(tq * 1e3, 3),
            "int8_speedup_vs_dense": round(t_dense / tq, 3),
            "speedup_vs_dense": round(t_dense / t, 3),
            "phase_ms": round(tp * 1e3, 3),
            "phase_rows_per_tile": tp_rpt,
            "phase_speedup_vs_dense": round(t_dense / tp, 3),
            "phase_union_density": round(sh_plan.union_density, 4),
            "fphase_ms": round(tfp * 1e3, 3),
            "fphase_rows_per_tile": tfp_rpt,
            "fphase_speedup_vs_dense": round(t_dense / tfp, 3),
            "imcol_ms": round(tic * 1e3, 3),
            "imcol_rows_per_tile": tic_rpt,
            "imcol_speedup_vs_dense": round(t_dense / tic, 3),
            "cphase_ms": round(tcp * 1e3, 3),
            "cphase_rows_per_tile": tcp_rpt,
            "cphase_speedup_vs_dense": round(t_dense / tcp, 3),
            "sconcat_ms": round(tsc * 1e3, 3),
            "sconcat_cfg": list(tsc_cfg),
            "sconcat_speedup_vs_dense": round(t_dense / tsc, 3),
        }))

    # phase kernel at density 1.0: the feasibility probe for a fused
    # residual-block kernel (BACKLOG #1 / VERDICT r2 #2) — if a Pallas
    # conv can't match XLA's dense conv at the layer-6 shape, chaining
    # conv+add+relu in VMEM cannot win either (XLA measured ~92% MXU here)
    from tpuseg.ops.sparse_conv import (
        phase_sparse_conv_apply,
        plan_shared_sparse_conv,
    )

    ones = np.ones_like(w)
    dense_plan = plan_shared_sparse_conv(w, ones, dilation=DIL)
    td_p, td_rpt = 1e9, 0
    for rpt in (2, 4, 8):
        try:
            tt = timeit(lambda xx, p=dense_plan, r=rpt:
                        phase_sparse_conv_apply(xx, p, rows_per_tile=r))
        except AssertionError:
            continue
        if tt < td_p:
            td_p, td_rpt = tt, rpt
    print(json.dumps({
        "metric": "phase_kernel_density_1.0",
        "ms": round(td_p * 1e3, 3),
        "rows_per_tile": td_rpt,
        "vs_xla_dense": round(t_dense / td_p, 3),
    }))


def bench_gathered():
    """The gather+dense-XLA-conv lowering (tpuseg.ops.gathered_conv) vs
    dense and vs the fused Pallas kernel at the layer-6 shape — the
    formulation that sidesteps the Pallas xmat copy floor entirely."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models.drn import conv2d
    from tpuseg.ops.gathered_conv import plan_gathered_conv
    from tpuseg.ops.sparse_conv import (
        fused_sparse_conv_apply,
        plan_fused_sparse_conv,
    )
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    N, H, W, C = 1, 128, 256, 512
    K, DIL = 3, 2
    INNER = 50
    rng = np.random.default_rng(0)
    w = rng.normal(size=(K, K, C, C)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def timeit(one_fn, reps=3):
        # full-output chaining (see bench_fused.timeit)
        @jax.jit
        def loop(x):
            def body(xc, _):
                return one_fn(xc).astype(xc.dtype), ()
            y, _ = jax.lax.scan(body, x, None, length=INNER)
            return y[0, 0, 0, 0].astype(jnp.float32)
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    wd = jnp.asarray(w).astype(jnp.bfloat16)
    t_dense = timeit(lambda xx: conv2d(xx, wd, 1, DIL, DIL))
    print(json.dumps({
        "metric": "gathered/dense_conv3x3_ms", "value": round(t_dense * 1e3, 3)
    }))
    for sparsity in [0.5, 0.75, 0.875]:
        w_oihw = np.transpose(w, (3, 2, 0, 1))
        mask_oihw = prune_as_block(
            w_oihw, BlockConfig(sparsity, 128, 128, -1, -1,
                                collapse_tensor=False)
        )
        mask = np.transpose(mask_oihw, (2, 3, 1, 0))
        row = {"metric": f"gathered_{int(sparsity*1000)/10}pct"}
        for mode in ("split", "exact", "grouped"):
            plan = plan_gathered_conv(w, mask, dilation=DIL, mode=mode)
            t = timeit(lambda xx, p=plan: p.apply(xx))
            row[f"{mode}_ms"] = round(t * 1e3, 3)
            row[f"{mode}_speedup"] = round(t_dense / t, 3)
            row["block_density"] = round(plan.block_density, 4)
        fplan = plan_fused_sparse_conv(w, mask, dilation=DIL)
        tf = timeit(lambda xx, p=fplan: fused_sparse_conv_apply(
            xx, p, rows_per_tile=4))
        row["fused_pallas_ms"] = round(tf * 1e3, 3)
        row["fused_pallas_speedup"] = round(t_dense / tf, 3)
        print(json.dumps(row))


def bench_rmcdb():
    """RMCDB roll+compact lowering vs dense matmul (tpuseg.ops.
    rmcdb_lowering) at realistic cyclic-diagonal geometries — the VERDICT
    round-3 item-5 experiment.  P = the stride-8 pixel count of a
    1024x2048 frame, (512, 512) layer shape."""
    import jax
    import jax.numpy as jnp

    from tpuseg.ops.rmcdb_lowering import detect_rmcdb_rolls, rmcdb_roll_matmul
    from tpuseg.sparsity.rmcdb import BlockletType, RmcdbConfig, prune_as_rmcdb

    P, ROWS, COLS = 128 * 256, 512, 512
    INNER = 30
    rng = np.random.default_rng(0)
    w = rng.normal(size=(ROWS, COLS)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(P, COLS)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def timeit(one_fn, reps=3):
        @jax.jit
        def loop(x):
            def body(xc, _):
                return one_fn(xc).astype(xc.dtype), ()
            y, _ = jax.lax.scan(body, x, None, length=INNER)
            return y[0, 0].astype(jnp.float32)
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    wd = jnp.asarray(w).astype(jnp.bfloat16)
    t_dense = timeit(lambda xx: xx @ wd.T)
    print(json.dumps({
        "metric": "rmcdb/dense_matmul_ms", "value": round(t_dense * 1e3, 3)
    }))
    for bh, b, count in ((64, 8, 2), (64, 16, 1), (64, 4, 2), (128, 16, 2)):
        cfg = RmcdbConfig(bh=bh, bw=bh, spo=0.0,
                          bl_types=[BlockletType(b, b)], bl_counts=[count])
        mask, _ = prune_as_rmcdb(w, cfg)
        plan = detect_rmcdb_rolls(w, mask.astype(np.float32), bh, bh, b)
        assert plan is not None
        t = timeit(lambda xx, p=plan: rmcdb_roll_matmul(xx, p))
        print(json.dumps({
            "metric": f"rmcdb_roll_bh{bh}_b{b}_c{count}",
            "density": round(plan.density, 4),
            "ms": round(t * 1e3, 3),
            "speedup_vs_dense": round(t_dense / t, 3),
        }))


def bench_layout():
    """W-major resident-activation experiment (VERDICT round-3 item 4),
    part 1: the layout-conversion cost.  A cross-layer W-major residency
    scheme pays one NHWC->alternate-layout transpose per sparse layer
    boundary (or keeps the whole chain resident and converts at the chain's
    ends); this measures those conversions at the layer-6 activation shape.
    Part 2 is already answered by the round-3 cphase control: assembling
    the xmat from perfectly aligned, shuffle-free slabs still costs MORE
    than the sliced concat (PERF_NOTES round 3) — i.e. even a FREE
    residency cannot beat the xmat copy floor.  This bench pins down how
    far from free the residency itself is."""
    import jax
    import jax.numpy as jnp

    N, H, W, C = 1, 128, 256, 512
    INNER = 50
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def timeit(one_fn, reps=3):
        # one_fn must preserve the carry's type (shape+dtype).  A naked
        # one-way transpose can't be scanned (carry type changes when
        # H != W), and a back-to-back transpose/inverse pair is cancelled
        # outright by XLA's algebraic simplifier — so shape-changing cases
        # go through timeit_roundtrip below, with optimization_barrier
        # keeping the pair honest.
        @jax.jit
        def loop(x):
            def body(xc, _):
                return one_fn(xc), ()
            y, _ = jax.lax.scan(body, x, None, length=INNER)
            return y.reshape(-1)[0].astype(jnp.float32)
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    def roundtrip(perm):
        # transpose -> barrier -> inverse transpose -> barrier: the carry
        # type is stable and the barriers stop XLA cancelling the pair, so
        # each scan step pays two real relayout copies.  Reported one-way
        # cost = roundtrip / 2.
        inv = tuple(int(i) for i in np.argsort(perm))

        def fn(xc):
            y = jax.lax.optimization_barrier(jnp.transpose(xc, perm))
            return jax.lax.optimization_barrier(jnp.transpose(y, inv))

        return fn

    # NHWC -> NCHW (channel-major resident: channel gathers hit the
    # untiled dim; taps stay on the tiled pair); NHWC -> NWHC (W-major:
    # dx shifts hit the untiled dim; dy stays sublane — the BACKLOG
    # item's literal layout).  The roundtrip is what a single
    # non-resident sparse layer would pay at its boundaries.
    perms = {
        "nhwc_nchw": (0, 3, 1, 2),
        "nhwc_nwhc": (0, 2, 1, 3),
    }
    for name, perm in perms.items():
        t = timeit(roundtrip(perm))
        print(json.dumps({"metric": f"layout/{name}_roundtrip_ms",
                          "value": round(t * 1e3, 3),
                          "one_way_ms": round(t * 1e3 / 2, 3)}))
    # control: one full-tensor copy at the same size (barrier keeps the
    # scan body from collapsing to a no-op)
    t = timeit(lambda xx: jax.lax.optimization_barrier(
        xx + jnp.uint8(0).astype(xx.dtype)))
    print(json.dumps({"metric": "layout/copy_ms", "value": round(t * 1e3, 3)}))


def bench_model():
    """End-to-end: dense vs block-sparse DRN-D-22 at 1024x2048."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.models.drnseg import drnseg_forward
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import FusedStage3Frontend
    from tpuseg.ops.upsample import upsample_argmax
    from tpuseg.sparsity import apply_masks
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    H, W = 1024, 2048
    INNER = 32
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    # same frontend as bench.py's headline program (stage-3-fused polyphase
    # with fused normalization; layers 0-3 are never sparse-eligible, so
    # sharing it across dense and masked runs is exact)
    stem = FusedStage3Frontend(
        folded, normalize=([0.290, 0.328, 0.287], [0.183, 0.187, 0.184])
    )

    def run_model(p, plans):
        def fn(frames_u8):
            _, seg, _ = drnseg_forward(
                p, {}, frames_u8, spec, train=False,
                compute_dtype=jnp.bfloat16,
                upsample=False, stem_fn=stem, stem_stages=4,
                sparse_plans=plans,
            )
            return upsample_argmax(seg, p["up.weight"]).astype(jnp.uint8)

        @jax.jit
        def loop(frames):
            # bench.py methodology: flat u8 frames, single-byte
            # data-dependent carry perturbation (no harness tax)
            def body(fc, _):
                ids = fn(fc)
                probe = ids[0, 0, 0].astype(fc.dtype)
                fc = jax.lax.dynamic_update_slice(
                    fc, probe.reshape((1,) * fc.ndim), (0,) * fc.ndim
                )
                return fc, probe
            _, probes = jax.lax.scan(body, frames, None, length=INNER)
            return probes.astype(jnp.int32).sum()

        x = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, size=(1, H, W * 3), dtype=np.uint8))
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    t_dense = run_model(jax.device_put(folded), None)
    print(json.dumps({"metric": "model_dense_fps", "value": round(1 / t_dense, 2)}))

    # 87.5% runs the full variant set; 50/75% run gathered-bf16 only (the
    # accuracy-preferred densities — the question there is how the best
    # lowering's model-level win scales, per-kernel numbers: 1.25x/1.83x)
    sweep = ([0.875, 0.75, 0.5] if "--sweep" in sys.argv else [0.875])
    for sparsity in sweep:
        masks = {}
        for name, v in folded.items():
            arr = np.asarray(v)
            if arr.ndim != 4 or name == "up.weight":
                continue
            w = hwio_to_oihw(arr)
            if w.shape[0] % 128 or w.shape[1] % 128:
                continue
            if (w.shape[0] // 128) * (w.shape[1] // 128) < 2:
                # single-block layers: BlockPruner's strict threshold
                # zeroes them ENTIRELY at any sparsity > 0 — excluding
                # them keeps the benchmark's masks servable (matches the
                # vendored block128 serving configs, gen_configs)
                continue
            m = prune_as_block(
                w, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
            )
            masks[name] = oihw_to_hwio(m).astype(np.float32)
        masked = apply_masks(folded, masks)
        full_set = sparsity == 0.875
        if full_set:
            plans, report = build_sparse_plans(masked, masks, spec)
            n_sparse = len(plans)  # fused + compact+sparse + rbgp lowerings
            t_sparse = run_model(jax.device_put(dict(masked)), plans)
            print(json.dumps({
                "metric": f"model_sparse_{int(sparsity*1000)/10}pct_fps",
                "value": round(1 / t_sparse, 2),
                "sparse_layers": n_sparse,
                "speedup_vs_dense": round(t_dense / t_sparse, 3),
            }))

        # same masks through the gather+dense-XLA lowering, both execution
        # forms (uniform repeat-padded split vs per-block exact supports)
        gplans, _ = build_sparse_plans(masked, masks, spec,
                                       lowering="gathered",
                                       gathered_mode="split")
        t_gath = run_model(jax.device_put(dict(masked)), gplans)
        print(json.dumps({
            "metric": f"model_gathered_{int(sparsity*1000)/10}pct_fps",
            "value": round(1 / t_gath, 2),
            "sparse_layers": len(gplans),
            "speedup_vs_dense": round(t_dense / t_gath, 3),
        }))
        explans, _ = build_sparse_plans(masked, masks, spec,
                                        lowering="gathered",
                                        gathered_mode="exact")
        t_ex = run_model(jax.device_put(dict(masked)), explans)
        print(json.dumps({
            "metric": f"model_gathered_exact_{int(sparsity*1000)/10}pct_fps",
            "value": round(1 / t_ex, 2),
            "sparse_layers": len(explans),
            "speedup_vs_dense": round(t_dense / t_ex, 3),
        }))

        if not full_set:
            continue
        # the full compression stack: prune (sparse kernels) + int8 PTQ on
        # the same layers (quantized fused kernels) + int8 on the
        # remaining eligible dense convs (tpuseg.ops.quant)
        from tpuseg.models.sparse_exec import quantize_sparse_plans
        from tpuseg.ops.quant import build_quant_plans

        qsp = quantize_sparse_plans(plans)
        qdense = build_quant_plans(dict(masked), spec)
        composed = {**qdense, **qsp}
        t_comp = run_model(jax.device_put(dict(masked)), composed)
        print(json.dumps({
            "metric": f"model_sparse_int8_{int(sparsity*1000)/10}pct_fps",
            "value": round(1 / t_comp, 2),
            "speedup_vs_dense": round(t_dense / t_comp, 3),
        }))

        # gathered lowering x int8 composition
        composed_g = {**qdense, **quantize_sparse_plans(gplans)}
        t_gq = run_model(jax.device_put(dict(masked)), composed_g)
        print(json.dumps({
            "metric": f"model_gathered_int8_{int(sparsity*1000)/10}pct_fps",
            "value": round(1 / t_gq, 2),
            "speedup_vs_dense": round(t_dense / t_gq, 3),
        }))
        composed_ex = {**qdense, **quantize_sparse_plans(explans)}
        t_exq = run_model(jax.device_put(dict(masked)), composed_ex)
        print(json.dumps({
            "metric":
                f"model_gathered_exact_int8_{int(sparsity*1000)/10}pct_fps",
            "value": round(1 / t_exq, 2),
            "speedup_vs_dense": round(t_dense / t_exq, 3),
        }))


def bench_frontend():
    """int8 the polyphase frontend?  conv0 (3x3 48->256) + conv1 (3x3
    256->256) are MXU-bound at 0.46 + 0.86 ms of the 9.4 ms dense frame
    (PERF_NOTES frame breakdown); after sparse+int8 serving shrinks the
    backbone, the bf16 frontend is ~25%% of the frame.  Times the fused
    frontend alone (chained scan, 1024x2048): bf16 vs int8 stem convs vs
    int8 stem + stage-3 convs.  Timing-only harness — activation scales
    are fixed constants; the accuracy-side wiring only happens if this
    wins."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import FusedStage3Frontend, fold_input
    from tpuseg.ops.quant import quantize_weight

    H, W = 1024, 2048
    INNER = 32
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    stem = FusedStage3Frontend(
        folded, normalize=([0.290, 0.328, 0.287], [0.183, 0.187, 0.184])
    )

    def q(w):
        wq, ws = quantize_weight(np.asarray(w, np.float32))
        return jnp.asarray(wq), jnp.asarray(ws)

    q_stem = [q(w) + (b, lo, hi) for (w, b, lo, hi) in stem.convs]
    q_b0c1 = (*q(stem.b0_conv1[0]), stem.b0_conv1[1],
              stem.b0_conv1[2], stem.b0_conv1[3])
    q_b0ds = (*q(stem.b0_ds[0]), stem.b0_ds[1], stem.b0_ds[2], stem.b0_ds[3])
    q_img = {name: q(w) + (b,) for name, (w, b) in stem.image_convs.items()}
    XS = jnp.float32(0.05)  # fixed activation scale: timing-only

    def iconv(x, wq, ws, lo, hi):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / XS),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=(1, 1),
            padding=[(lo, hi), (lo, hi)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (XS * ws)).astype(stem.dtype)

    def fwd(x, int8_stem, int8_stage3):
        x = fold_input(x, stem.f)
        mean48, inv_std48 = stem.normalize
        x = ((x.astype(jnp.float32) / 255.0 - mean48) * inv_std48)
        x = x.astype(stem.dtype)
        for (wp, bias, lo, hi), (wq, ws, _b, _lo, _hi) in zip(
                stem.convs, q_stem):
            if int8_stem:
                x = jax.nn.relu(iconv(x, wq, ws, lo, hi) + bias)
            else:
                x = jax.nn.relu(jax.lax.conv_general_dilated(
                    x, wp, (1, 1), [(lo, hi), (lo, hi)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias)
        if int8_stage3:
            wq, ws, b1, lo1, hi1 = q_b0c1
            y1 = jax.nn.relu(iconv(x, wq, ws, lo1, hi1) + b1)
            wq, ws, bd, lod, hid = q_b0ds
            yd = iconv(x, wq, ws, lod, hid) + bd
            def ic(xx, name):
                wq, ws, b = q_img[name]
                return iconv(xx, wq, ws, 1, 1) + b
            out = jax.nn.relu(ic(y1, f"{stem.stage3}.0.conv2") + yd)
            r = out
            out = jax.nn.relu(ic(out, f"{stem.stage3}.1.conv1"))
            return jax.nn.relu(ic(out, f"{stem.stage3}.1.conv2") + r)
        w1, b1, lo1, hi1 = stem.b0_conv1
        y1 = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(lo1, hi1), (lo1, hi1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1)
        wd, bd, lod, hid = stem.b0_ds
        yd = jax.lax.conv_general_dilated(
            x, wd, (1, 1), [(lod, hid), (lod, hid)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bd
        out = jax.nn.relu(stem._conv(y1, f"{stem.stage3}.0.conv2") + yd)
        r = out
        out = jax.nn.relu(stem._conv(out, f"{stem.stage3}.1.conv1"))
        return jax.nn.relu(stem._conv(out, f"{stem.stage3}.1.conv2") + r)

    def timeit(int8_stem, int8_stage3):
        @jax.jit
        def loop(frames):
            def body(fc, _):
                y = fwd(fc, int8_stem, int8_stage3)
                probe = y[0, 0, 0, 0].astype(fc.dtype)
                fc = jax.lax.dynamic_update_slice(
                    fc, probe.reshape((1,) * fc.ndim), (0,) * fc.ndim)
                return fc, probe
            _, probes = jax.lax.scan(body, frames, None, length=INNER)
            return probes.astype(jnp.float32).sum()
        x = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, size=(1, H, W * 3), dtype=np.uint8))
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    t_bf16 = timeit(False, False)
    print(json.dumps({"metric": "frontend/bf16_ms",
                      "value": round(t_bf16 * 1e3, 3)}))
    for name, a, b in (("int8_stem", True, False),
                       ("int8_stem_stage3", True, True)):
        t = timeit(a, b)
        print(json.dumps({"metric": f"frontend/{name}_ms",
                          "value": round(t * 1e3, 3),
                          "speedup_vs_bf16": round(t_bf16 / t, 3)}))


def bench_train():
    """Masked TRAIN step: dense-masked (reference semantics) vs sparse
    execution with custom VJPs (tpuseg.ops.sparse_train) at 87.5% block
    sparsity on the layer-6-shaped conv."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models.drn import conv2d
    from tpuseg.ops.sparse_train import plan_sparse_conv_train, sparse_conv_train
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    N, H, W, C = 1, 128, 256, 512
    K, DIL = 3, 2
    INNER = 30
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(K, K, C, C)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))

    for sparsity in (0.875,):
        m = prune_as_block(
            hwio_to_oihw(w0),
            BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False),
        )
        mask = oihw_to_hwio(m).astype(np.float32)
        mj = jnp.asarray(mask)
        st = plan_sparse_conv_train(mask, dilation=DIL, rows_per_tile=8)

        def loss_dense(w_, x_):
            y = conv2d(x_, (w_ * mj).astype(jnp.bfloat16), 1, DIL, DIL,
                       compute_dtype=jnp.bfloat16)
            return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)

        def loss_sparse(w_, x_):
            y = sparse_conv_train(x_, w_, st, compute_dtype=jnp.bfloat16)
            return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)

        def time_train(loss_fn):
            grad_fn = jax.grad(loss_fn)

            @jax.jit
            def loop(w_):
                def body(wc, _):
                    g = grad_fn(wc, x)
                    return wc - 1e-4 * g, g[0, 0, 0, 0]
                w2, _ = jax.lax.scan(body, w_, None, length=INNER)
                return w2
            wj = jnp.asarray(w0)
            o = loop(wj)
            float(np.asarray(o).sum())
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                o = loop(wj)
                float(np.asarray(o).sum())
                best = min(best, (time.perf_counter() - t0) / INNER)
            return best

        t_dense = time_train(loss_dense)
        t_sparse = time_train(loss_sparse)
        print(json.dumps({
            "metric": f"train_step_sparse_{int(sparsity*1000)/10}pct",
            "dense_ms": round(t_dense * 1e3, 3),
            "sparse_ms": round(t_sparse * 1e3, 3),
            "speedup_vs_dense_masked": round(t_dense / t_sparse, 3),
            "union_density": round(st.block_density, 4),
        }))


def bench_conv1split():
    """Round-5 frontend probe (round-4 verdict #7): phase-aware splitting
    of the folded stem conv1.

    The f=4 polyphase fold turns conv1 (3x3 s1 16->16 full-res) into a
    (3,3) 256->256 conv on the quarter grid whose weight is 1/16 dense —
    the 16x zero-pad overcompute is the price of full MXU lanes
    (PERF_NOTES frame table: 0.86 ms at MXU peak).  The fold's phase
    structure is separable: output phase a needs m-taps {0} for a in
    {1,2}, {-1,0} for a=0, {0,1} for a=3 (same on the other axis).
    Splitting output phases into groups with exact kernels cuts padded
    FLOPs 2x (1D split: (1,3)x128 + two (2,3)x64, 77.4 GF) or 4x (2D
    split: 9 convs, 38.7 GF) — at the cost of thinner outputs (the
    m-split dead end's failure mode) and more dispatches.  The channel
    order of the concatenated outputs is a fixed permutation that folds
    into conv2's input channels for free, so recombination costs nothing
    (unlike dead-end #6's adds).  This probe measures conv1 alone,
    chained-scan, all variants, and numerics vs the dense fold.
    """
    import jax
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import FusedStage3Frontend

    INNER = 32
    Hq, Wq = 256, 512  # 1024x2048 on the f=4 grid
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    stem = FusedStage3Frontend(
        folded, normalize=([0.290, 0.328, 0.287], [0.183, 0.187, 0.184]))
    wp, bias, lo, hi = stem.convs[1]  # folded conv1: (3,3,256,256)
    wp = np.asarray(wp, np.float32)
    assert wp.shape == (3, 3, 256, 256) and (lo, hi) == (1, 1), (
        wp.shape, lo, hi)
    f, C = 4, 16

    def phase_cols(avals, bvals):
        cols = [
            (a * f + b) * C + k
            for a in avals for b in bvals for k in range(C)
        ]
        return np.asarray(cols, np.int64)

    # tap sets per phase-type on one axis: (tap indices into the folded
    # kernel dim, pad_lo, pad_hi)
    AXIS = {
        "mid": ((1,), 0, 0),       # a in {1,2}: m = 0 only
        "lo": ((0, 1), 1, 0),      # a = 0: m in {-1, 0}
        "hi": ((1, 2), 0, 1),      # a = 3: m in {0, 1}
    }
    PHASES = {"mid": (1, 2), "lo": (0,), "hi": (3,)}

    def group_conv(x, rows, cols_sel, rt, ct):
        taps_r, plo_r, phi_r = AXIS[rt]
        taps_c, plo_c, phi_c = AXIS[ct]
        w = wp[np.ix_(taps_r, taps_c)][:, :, :, cols_sel]
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), (1, 1),
            [(plo_r, phi_r), (plo_c, phi_c)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def split_fwd(x, types_r, types_c):
        outs, cols_all = [], []
        for rt in types_r:
            for ct in types_c:
                cols = phase_cols(PHASES[rt], PHASES[ct])
                outs.append(group_conv(x, None, cols, rt, ct))
                cols_all.append(cols)
        y = jnp.concatenate(outs, axis=-1)
        perm = np.argsort(np.concatenate(cols_all))
        return y, perm

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(1, Hq, Wq, 256)).astype(np.float32) * 0.1,
        jnp.bfloat16)

    def dense_fwd(xx):
        return jax.lax.conv_general_dilated(
            xx, jnp.asarray(wp, xx.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # numerics: the split output (permuted back) must equal the dense fold
    y_ref = np.asarray(dense_fwd(x), np.float32)
    for name, (tr, tc) in (
            ("split1d", (("lo", "mid", "hi"), ("mid",))),
            ("split2d", (("lo", "mid", "hi"), ("lo", "mid", "hi")))):
        if name == "split1d":
            # 1D: split rows only; columns keep the full (.,3) structure
            outs = []
            cols_all = []
            for rt in ("lo", "mid", "hi"):
                cols = phase_cols(PHASES[rt], range(f))
                taps_r, plo_r, phi_r = AXIS[rt]
                w = wp[np.ix_(taps_r, (0, 1, 2))][:, :, :, cols]
                outs.append(jax.lax.conv_general_dilated(
                    x, jnp.asarray(w, x.dtype), (1, 1),
                    [(plo_r, phi_r), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
                cols_all.append(cols)
            y = jnp.concatenate(outs, axis=-1)
            perm = np.argsort(np.concatenate(cols_all))
        else:
            y, perm = split_fwd(x, ("lo", "mid", "hi"), ("lo", "mid", "hi"))
        err = np.abs(np.asarray(y, np.float32)[..., perm] - y_ref).max()
        scale = np.abs(y_ref).max()
        assert err < 0.02 * scale + 1e-3, (name, err, scale)
        print(json.dumps({"metric": f"conv1split/{name}_numerics_ok",
                          "max_abs_err": float(err)}))

    def timeit(fn):
        @jax.jit
        def loop(xx):
            def body(c, _):
                y = fn(c)
                return y[..., :256].astype(c.dtype), ()
            o, _ = jax.lax.scan(body, xx, None, length=INNER)
            # scalar probe computed ON DEVICE: fetching the full tensor
            # would charge ~3 s of D2H to every rep on the tunneled link
            return o[0, 0, 0, 0].astype(jnp.float32)
        float(np.asarray(loop(x)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(x)))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    def fwd_1d(xx):
        outs = []
        for rt in ("lo", "mid", "hi"):
            cols = phase_cols(PHASES[rt], range(f))
            taps_r, plo_r, phi_r = AXIS[rt]
            w = wp[np.ix_(taps_r, (0, 1, 2))][:, :, :, cols]
            outs.append(jax.lax.conv_general_dilated(
                xx, jnp.asarray(w, xx.dtype), (1, 1),
                [(plo_r, phi_r), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.concatenate(outs, axis=-1)

    def fwd_2d(xx):
        return split_fwd(xx, ("lo", "mid", "hi"), ("lo", "mid", "hi"))[0]

    t_dense = timeit(dense_fwd)
    t_1d = timeit(fwd_1d)
    t_2d = timeit(fwd_2d)
    print(json.dumps({
        "metric": "conv1split_ms",
        "dense": round(t_dense * 1e3, 3),
        "split1d": round(t_1d * 1e3, 3),
        "split2d": round(t_2d * 1e3, 3),
        "speedup_1d": round(t_dense / t_1d, 3),
        "speedup_2d": round(t_dense / t_2d, 3),
    }))


def bench_trainer():
    """FULL seg trainer step on-chip: make_seg_train_step dense-masked vs
    --sparse-exec (sparse_plans from build_sparse_train_structs), the path
    `semantic_seg train --sparse-exec` actually runs.  Vendored block128reg
    87.5% geometry, drn_d_22, bf16, 512x512 crop, batch 4 — scan-chained
    steps carrying the whole TrainState so XLA cannot DCE or overlap."""
    import os

    import jax
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.ops.sparse_train import build_sparse_train_structs
    from tpuseg.sparsity import create_masker
    from tpuseg.train import create_train_state, make_seg_train_step, make_sgd

    CROP, BATCH, INNER = 512, 4, 16
    cfg = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "optimal_configs", "drn_d_22", "drn_d_22_block128reg_87.50.json",
    )
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    masker = create_masker(cfg, seed=0)
    masks = masker.generate_masks(params, is_static=True)
    structs, report = build_sparse_train_structs(masks, spec)
    n_sparse = sum(1 for v in report.values() if v.startswith("sparse-train"))

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
        float(np.asarray(o.params["seg.weight"]).sum())  # force completion
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = loop(ts)
            float(np.asarray(o.params["seg.weight"]).sum())
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    t_dense = time_step(None)
    t_sparse = time_step(structs)
    print(json.dumps({
        "metric": "trainer_step_sparse_exec_block128reg_87.5",
        "crop": CROP, "batch": BATCH,
        "dense_masked_ms": round(t_dense * 1e3, 2),
        "sparse_exec_ms": round(t_sparse * 1e3, 2),
        "speedup_vs_dense_masked": round(t_dense / t_sparse, 3),
        "sparse_layers": n_sparse,
    }))


if __name__ == "__main__":
    import sys

    if ("--fused-only" not in sys.argv and "--model" not in sys.argv
            and "--train" not in sys.argv and "--gathered" not in sys.argv
            and "--rmcdb" not in sys.argv and "--layout" not in sys.argv
            and "--frontend" not in sys.argv and "--trainer" not in sys.argv
            and "--conv1split" not in sys.argv):
        main()
    if ("--fused" in sys.argv or "--fused-only" in sys.argv
            or "--fused-appendix" in sys.argv):
        bench_fused()
    if "--gathered" in sys.argv:
        bench_gathered()
    if "--frontend" in sys.argv:
        bench_frontend()
    if "--rmcdb" in sys.argv:
        bench_rmcdb()
    if "--layout" in sys.argv:
        bench_layout()
    if "--model" in sys.argv:
        bench_model()
    if "--train" in sys.argv:
        bench_train()
    if "--trainer" in sys.argv:
        bench_trainer()
    if "--conv1split" in sys.argv:
        bench_conv1split()
