"""Trained-weights fidelity report: every approximate serving mode and the
pruning-recovery loop, measured on CONVERGED weights.

Why this exists: the reference's accuracy checkpoints are stripped from the
mirror, so tpuseg's fidelity numbers (int8/temporal/warp ids agreement,
forward parity) were historically measured on random weights — which
produce blob-like maps that flatter temporal id-reuse (reuse loses
agreement exactly at sharp moving boundaries).  This tool closes that gap
with a fully self-contained proxy: it converges real models on the shapes
world (tpuseg.data.shapes), then re-measures everything on the trained
weights, with GROUND-TRUTH mIoU per serving mode as a bonus the reference
never had (the synthetic world knows its own labels per frame).

Stages (``--stage all`` runs them in order, each appends to
``<out>/report.json``):

- ``train``    converge DRN-D-22 on shapes scenes (infinite fresh data,
               early-stops at --target-miou); saves <out>/drn_d_22_shapes.npz
- ``fidelity`` run the full serving-mode matrix (exact, int8 dynamic /
               calibrated, temporal N=2/4, +warp, budgeted, budgeted
               compositions) on a moving-shapes video with the trained
               weights: ids agreement vs the exact run AND ground-truth
               mIoU per mode
- ``compress`` the compression research loop the reference exists for
               (semantic_seg.py:1070-1097): dense vs RBGP-50% (vendored
               config) vs magnitude-unstructured-50%, accuracy at mask
               time and a retrain recovery curve
- ``compose``  full-stack serving composition on RECOVERED sparse weights:
               recover the vendored block128reg 87.5% geometry (cached
               checkpoint), then serve it through the real pipeline
               (gathered-exact sparse plans, as `seg_video
               --pr-config-path`) composed with int8 PTQ and budgeted
               temporal — GT mIoU per composed mode next to the dense
               trained baseline
- ``budget_curve`` (opt-in, not part of ``all``) the GT-mIoU-vs-refresh-
               budget tradeoff surface for the budgeted temporal mode:
               exact baseline + budgeted at each K in ``--budget-ks``,
               for each drift speed in ``--speeds``
- ``cls``      the rmbsnn arm (rmbsnn_main.py:396-428): cifar_resnet20
               teacher on synthetic CIFAR, RBGP-pruned student retrained
               with and without knowledge distillation

Everything runs on whatever backend jax resolves (TPU when the relay is
up; CPU works — the numbers are domain-level fidelity, not wall-clock).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from tpuseg.data import shapes


def _append_report(out: str, entry: dict) -> None:
    path = os.path.join(out, "report.json")
    rows = []
    if os.path.exists(path):
        with open(path) as fh:
            rows = json.load(fh)
    # rows are keyed by (stage, arch): multi-arch sweeps into one out dir
    # must not clobber each other's entries
    def same(r):
        return (r.get("stage") == entry.get("stage")
                and r.get("arch") == entry.get("arch"))

    prev = next((r for r in rows if same(r)), None)
    if prev and isinstance(prev.get("modes"), dict) and "modes" in entry:
        # partial fidelity runs (--modes / backend-gated int8) merge into
        # the existing mode matrix instead of clobbering it
        entry = {**prev, **entry, "modes": {**prev["modes"], **entry["modes"]}}
    rows = [r for r in rows if not same(r)]
    rows.append(entry)
    os.makedirs(out, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rows, fh, indent=2)
        fh.write("\n")
    os.replace(tmp, path)
    print(json.dumps(entry))


def _shapes_stats() -> tuple[np.ndarray, np.ndarray]:
    mean = shapes.CLASS_COLORS.mean(0) / 255.0
    std = np.array([0.25, 0.25, 0.25], np.float32)
    return mean.astype(np.float32), std


def _normalize(imgs_u8: np.ndarray) -> np.ndarray:
    mean, std = _shapes_stats()
    return ((imgs_u8.astype(np.float32) / 255.0) - mean) / std


def _val_set(size: tuple[int, int], n: int = 16, seed: int = 777):
    rng = np.random.default_rng(seed)
    return shapes.sample_batch(rng, n, size)


def _eval_miou(eval_step, params, bn_state, imgs_u8, labels, batch=8) -> float:
    from tpuseg.metrics.seg import fast_hist, miou_from_hist

    hist = np.zeros((shapes.N_CLASSES, shapes.N_CLASSES), np.int64)
    for i in range(0, len(imgs_u8), batch):
        x = _normalize(imgs_u8[i : i + batch])
        y = labels[i : i + batch].astype(np.int32)
        _, preds = eval_step(params, bn_state, x, y)
        hist += fast_hist(
            np.asarray(preds).ravel(), y.ravel(), shapes.N_CLASSES
        )
    return float(miou_from_hist(hist))


def _train_seg_model(
    params,
    state,
    spec,
    *,
    masks=None,
    steps: int,
    size: tuple[int, int],
    batch: int,
    lr: float,
    target_miou: float | None,
    eval_every: int,
    seed: int,
    log_prefix: str,
    keep_best: bool = False,
    sparse_exec: bool = False,
):
    """SGD-train (params, state) on fresh shapes scenes; returns
    (params, bn_state, curve) where curve is [(step, val_miou), ...].

    ``keep_best=True`` returns the weights from the eval with the highest
    val mIoU instead of the last step's — the reference's checkpoint_best
    semantics (`semantic_seg.py:286-290`), which is what a deployment
    would actually ship.  Recovery curves are noisy near convergence
    (measured: d54 block128reg swings 86-89 past step 550), so last-step
    weights can sit points below the band's top."""
    import jax.numpy as jnp

    from tpuseg.train import create_train_state, make_eval_step, make_sgd
    from tpuseg.train import make_seg_train_step
    import jax

    tx = make_sgd(lr, momentum=0.9, weight_decay=1e-4)
    sparse_plans = None
    if sparse_exec and masks is not None:
        # recovery through the REAL sparse train step (--sparse-exec):
        # the same fused-kernel path `semantic_seg train --sparse-exec`
        # runs, so the recovered-mIoU story covers the productized loop
        from tpuseg.ops.sparse_train import build_sparse_train_structs

        sparse_plans, report = build_sparse_train_structs(masks, spec)
        n = sum(1 for v in report.values() if v.startswith("sparse-train"))
        print(f"{log_prefix}: sparse-exec on {n} eligible layers")
        sparse_plans = sparse_plans or None
    train_step = jax.jit(
        make_seg_train_step(spec, tx, sparse_plans=sparse_plans))
    eval_step = jax.jit(make_eval_step(spec, "seg"))
    st = create_train_state(params, state, tx, masks=masks)
    rng = np.random.default_rng(seed)
    val_imgs, val_labels = _val_set(size)
    curve = []
    best = None  # (miou, host params, host bn_state, step)
    t0 = time.time()
    for step in range(1, steps + 1):
        imgs, labs = shapes.sample_batch(rng, batch, size)
        st, metrics = train_step(
            st, jnp.asarray(_normalize(imgs)), jnp.asarray(labs.astype(np.int32))
        )
        if step % eval_every == 0 or step == steps:
            miou = _eval_miou(
                eval_step, st.params, st.bn_state, val_imgs, val_labels
            )
            curve.append((step, round(miou, 4)))
            print(
                f"{log_prefix} step {step}: loss="
                f"{float(np.asarray(metrics['loss'])):.4f} "
                f"val_miou={miou:.4f} ({time.time() - t0:.0f}s)"
            )
            if keep_best and (best is None or miou > best[0]):
                best = (miou, jax.device_get(st.params),
                        jax.device_get(st.bn_state), step)
            if target_miou is not None and miou >= target_miou:
                break
    if keep_best and best is not None:
        print(f"{log_prefix}: keeping best weights "
              f"(step {best[3]}, val_miou={best[0]:.4f})")
        return best[1], best[2], curve
    return st.params, st.bn_state, curve


def stage_train(args) -> str:
    import jax

    from tpuseg.models import init_drnseg

    size = (args.train_size, args.train_size)
    params, state, spec = init_drnseg(
        jax.random.key(args.seed), args.arch, shapes.N_CLASSES
    )
    params, bn_state, curve = _train_seg_model(
        params,
        state,
        spec,
        steps=args.steps,
        size=size,
        batch=args.batch,
        lr=args.lr,
        target_miou=args.target_miou,
        eval_every=args.eval_every,
        seed=args.seed + 1,
        log_prefix="train",
    )
    from tpuseg.train import save_checkpoint

    ckpt = os.path.join(args.out, f"{args.arch}_shapes.npz")
    save_checkpoint(
        ckpt,
        params,
        bn_state,
        meta={"arch": args.arch, "classes": shapes.N_CLASSES,
              "world": "shapes", "train_size": args.train_size},
    )
    _append_report(
        args.out,
        {
            "stage": "train",
            "arch": args.arch,
            "train_size": args.train_size,
            "steps_run": curve[-1][0] if curve else 0,
            "val_miou": curve[-1][1] if curve else None,
            "curve": curve,
            "checkpoint": ckpt,
        },
    )
    return ckpt


def _load_trained(args):
    from tpuseg.models.drnseg import build_drnseg_spec
    from tpuseg.train import load_checkpoint

    ckpt = os.path.join(args.out, f"{args.arch}_shapes.npz")
    if not os.path.exists(ckpt):
        raise SystemExit(
            f"{ckpt} not found — run --stage train first (or --stage all)"
        )
    params, bn_state, _masks, _opt, meta = load_checkpoint(ckpt)
    spec = build_drnseg_spec(args.arch, shapes.N_CLASSES)
    return params, bn_state, spec, meta


def _gt_miou_from_ids(ids: list[np.ndarray], labels: np.ndarray) -> float:
    from tpuseg.metrics.seg import fast_hist, miou_from_hist

    hist = np.zeros((shapes.N_CLASSES, shapes.N_CLASSES), np.int64)
    for i, frame_ids in enumerate(ids):
        hist += fast_hist(
            np.asarray(frame_ids).ravel(),
            labels[i].ravel().astype(np.int32),
            shapes.N_CLASSES,
        )
    return float(miou_from_hist(hist))


def _drift_thresh(frames: np.ndarray) -> tuple[float, float]:
    """Drift scale of THIS video -> (threshold, mean |delta|); shared with
    the serving autotuner (tpuseg.video.autotune)."""
    from tpuseg.video.autotune import drift_threshold

    return drift_threshold(frames)


def stage_fidelity(args) -> None:
    import jax

    from tpuseg.ops.quant import ids_agreement
    from tpuseg.video.pipeline import VideoSegmenter

    params, bn_state, spec, _meta = _load_trained(args)
    mean, std = _shapes_stats()
    h = args.train_size
    w = 2 * h
    frames, labels = shapes.shapes_video(
        args.video_frames, (h, w), seed=args.seed + 2, speed=args.speed
    )
    frame_list = list(frames)

    thresh, drift_mean = _drift_thresh(frames)

    def run_mode(**kw):
        seg = VideoSegmenter(
            dict(params), dict(bn_state), spec, mean, std,
            batch=args.serve_batch, **kw,
        )
        res = seg.run(frame_list, need_color=False)
        return res["ids"]

    budget = dict(temporal_thresh=thresh,
                  temporal_budget=max(1, args.serve_batch // 4))
    # the flow warp pools luma /8 then block-matches on a 16px grid:
    # frames must be multiples of 128 per axis (tpuseg.video.flow)
    warp_ok = h % 128 == 0 and w % 128 == 0
    modes: dict[str, dict] = {
        "exact": {},
        "yuv420": dict(transport="yuv420"),
        "int8_dynamic": dict(quantize=True),
        "int8_calib": dict(quantize=True, calib_frames=frames[:8]),
        "int8_stem_calib": dict(quantize=True, quantize_stem=True,
                                calib_frames=frames[:8]),
        "temporal2": dict(temporal_interval=2),
        "temporal2_nearest": dict(temporal_interval=2, temporal_nearest=True),
        "temporal4": dict(temporal_interval=4),
        "temporal4_nearest": dict(temporal_interval=4, temporal_nearest=True),
        "budget": dict(budget),
        "budget_nearest": dict(budget, temporal_nearest=True),
        "budget_int8": dict(budget, quantize=True, calib_frames=frames[:8]),
    }
    if warp_ok:
        modes["temporal2_warp"] = dict(temporal_interval=2, temporal_warp=True)
        modes["budget_warp"] = dict(budget, temporal_warp=True)
        modes["budget_warp_nearest"] = dict(
            budget, temporal_warp=True, temporal_nearest=True
        )
        modes["budget_warp_int8"] = dict(
            budget, temporal_warp=True, quantize=True, calib_frames=frames[:8]
        )
    else:
        print(f"fidelity: skipping warp modes (frame {h}x{w} not a "
              "multiple of 128 per axis)")
    if args.modes:
        keep = {m.strip() for m in args.modes.split(",")}
        keep.add("exact")  # the agreement baseline is always needed
        modes = {k: v for k, v in modes.items() if k in keep}
    elif jax.default_backend() == "cpu":
        # XLA-CPU lowers int8 convs to a naive loop (measured ~100x slower
        # than f32 at this shape — effectively hours per mode); int8 modes
        # are TPU-only unless forced via --modes
        dropped = [k for k in modes if "int8" in k]
        modes = {k: v for k, v in modes.items() if "int8" not in k}
        if dropped:
            print(f"fidelity: skipping {dropped} on the CPU backend "
                  "(naive int8 conv lowering; run on TPU or force with "
                  "--modes)")
    exact_ids = None
    rows = {}
    for name, kw in modes.items():
        t0 = time.time()
        ids = run_mode(**kw)
        if name == "exact":
            exact_ids = ids
        n = min(len(ids), len(exact_ids), len(labels))
        rows[name] = {
            "ids_agreement_vs_exact": round(
                ids_agreement(
                    np.stack(ids[:n]), np.stack(exact_ids[:n])
                ), 4
            ),
            "gt_miou": round(_gt_miou_from_ids(ids[:n], labels[:n]), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"fidelity {name}: {rows[name]}")
    _append_report(
        args.out,
        {
            "stage": "fidelity",
            "arch": args.arch,
            "weights": "trained-on-shapes",
            "video": {
                "frames": args.video_frames,
                "size": [h, w],
                "speed_px_per_frame": args.speed,
                "drift_mean_abs_delta": round(drift_mean, 2),
                "thresh_used": round(thresh, 2),
            },
            "modes": rows,
        },
    )


def stage_compress(args) -> None:
    from tpuseg.sparsity import create_masker
    from tpuseg.sparsity.base import apply_masks
    from tpuseg.train import (
        magnitude_unstructured_masks,
        make_eval_step,
    )
    import jax

    params, bn_state, spec, _meta = _load_trained(args)
    size = (args.train_size, args.train_size)
    eval_step = jax.jit(make_eval_step(spec, "seg"))
    val_imgs, val_labels = _val_set(size)
    dense_miou = _eval_miou(eval_step, params, bn_state, val_imgs, val_labels)

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cfg = os.path.join(
        repo_root, "optimal_configs", args.arch,
        f"{args.arch}_512X512_0.00_50.00.json",
    )
    serving_cfg = os.path.join(
        repo_root, "optimal_configs", args.arch,
        f"{args.arch}_block128_87.50.json",
    )
    regular_cfg = os.path.join(
        repo_root, "optimal_configs", args.arch,
        f"{args.arch}_block128reg_87.50.json",
    )
    variants = {
        "rbgp_50": create_masker(cfg, seed=args.seed).generate_masks(params),
        "unstructured_50": magnitude_unstructured_masks(params, 0.5),
        # the vendored SERVING geometries: raw BlockPruner block128 (the
        # speed end — strict threshold kills whole small layers at 87.5%,
        # exact-mode serving measured 616 fps) and block-regular N:M (the
        # fidelity end — per-out-block top-k, no dead channels).  Their
        # accuracy-recovery stories belong next to the research geometries
        "block128_87.5": create_masker(
            serving_cfg, seed=args.seed).generate_masks(params),
        "block128reg_87.5": create_masker(
            regular_cfg, seed=args.seed).generate_masks(params),
    }
    if args.variants:
        want = {v.strip() for v in args.variants.split(",") if v.strip()}
        unknown = want - set(variants)
        if unknown:
            raise SystemExit(
                f"--variants: unknown {sorted(unknown)}; "
                f"have {sorted(variants)}")
        variants = {k: v for k, v in variants.items() if k in want}
    results = {"dense_miou": round(dense_miou, 4)}
    for name, masks in variants.items():
        masked = apply_masks(
            {k: np.asarray(v) for k, v in params.items()},
            {k: np.asarray(v) for k, v in masks.items()},
        )
        at_mask = _eval_miou(eval_step, masked, bn_state, val_imgs, val_labels)
        _p, _bn, curve = _train_seg_model(
            masked,
            bn_state,
            spec,
            masks=masks,
            steps=args.recover_steps,
            size=size,
            batch=args.batch,
            lr=args.lr * 0.2,  # fine-tune LR, reference retrains at lr/5
            target_miou=None,
            eval_every=args.eval_every,
            seed=args.seed + 3,
            log_prefix=f"recover[{name}]",
            sparse_exec=getattr(args, "sparse_exec", False),
        )
        results[name] = {
            "miou_at_mask": round(at_mask, 4),
            "recovery_curve": curve,
            "miou_recovered": curve[-1][1] if curve else None,
            **({"sparse_exec": True}
               if getattr(args, "sparse_exec", False) else {}),
        }
        print(f"compress {name}: {results[name]}")
    _append_report(
        args.out,
        {"stage": "compress", "arch": args.arch,
         "weights": "trained-on-shapes", **results},
    )


def stage_compose(args) -> None:
    """Full-stack serving composition on RECOVERED sparse weights.

    The README's composed-throughput row (block128reg 87.5% + int8 +
    budgeted temporal, 583 fps device rate) carries an agreement number
    measured against its own exact run — this stage pins the GROUND-TRUTH
    mIoU of that exact configuration chain on accuracy-bearing weights:
    recover the vendored block128reg geometry from the trained checkpoint
    (masked fine-tune, cached at <out>/<arch>_shapes_block128reg.npz), then
    serve it through the real pipeline (gathered-exact sparse plans, the
    same build as `seg_video --pr-config-path`) composed with int8 PTQ and
    budgeted temporal reuse, next to the dense trained baseline.

    The sparse lowering itself is bit-exactness-TESTED (tests/
    test_gathered_conv.py), so `sparse_exact` vs `dense_exact` isolates the
    mask's accuracy cost and the int8/temporal rows isolate each
    approximation's cost on top — per-row GT mIoU, no random-weights
    caveat anywhere in the chain.
    """
    import jax

    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.quant import ids_agreement
    from tpuseg.sparsity import create_masker
    from tpuseg.sparsity.base import apply_masks
    from tpuseg.train import load_checkpoint, save_checkpoint
    from tpuseg.video.pipeline import VideoSegmenter

    params, bn_state, spec, _meta = _load_trained(args)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    regular_cfg = os.path.join(
        repo_root, "optimal_configs", args.arch,
        f"{args.arch}_block128reg_87.50.json",
    )
    rec_ckpt = os.path.join(args.out, f"{args.arch}_shapes_block128reg.npz")
    if os.path.exists(rec_ckpt):
        r_params, r_bn, masks, _opt, rec_meta = load_checkpoint(rec_ckpt)
        print(f"compose: reusing recovered checkpoint {rec_ckpt} "
              f"(recovered mIoU {rec_meta.get('miou_recovered')})")
    else:
        # magnitude masks from the TRAINED weights (same build as
        # stage_compress's block128reg_87.5 variant), then masked fine-tune
        masks = create_masker(
            regular_cfg, seed=args.seed).generate_masks(params)
        masked = apply_masks(
            {k: np.asarray(v) for k, v in params.items()},
            {k: np.asarray(v) for k, v in masks.items()},
        )
        r_params, r_bn, curve = _train_seg_model(
            masked,
            bn_state,
            spec,
            masks=masks,
            steps=args.recover_steps,
            size=(args.train_size, args.train_size),
            batch=args.batch,
            lr=args.lr * 0.2,
            target_miou=None,
            eval_every=args.eval_every,
            seed=args.seed + 3,
            log_prefix="compose-recover",
            # ship what a deployment ships: the best eval's weights
            # (reference checkpoint_best semantics) — recovery curves
            # are noisy near convergence
            keep_best=True,
        )
        rec_meta = {"miou_recovered": max((m for _, m in curve),
                                          default=None),
                    "recover_steps": args.recover_steps}
        # masks ride along so serving reconstructs the EXACT recovery
        # geometry (magnitude masks regenerated from recovered weights
        # would differ)
        save_checkpoint(rec_ckpt, r_params, r_bn, masks=masks,
                        meta=rec_meta)

    folded = fold_bn(
        {k: np.asarray(v) for k, v in r_params.items()},
        {k: np.asarray(v) for k, v in r_bn.items()},
        spec,
    )
    plans, report = build_sparse_plans(
        folded,
        {k: np.asarray(v) for k, v in masks.items()},
        spec,
        lowering="gathered",
        gathered_mode="exact",
    )
    n_sparse = sum(1 for v in report.values() if not v.startswith("dense"))
    print(f"compose: {n_sparse}/{len(report)} masked convs on the "
          "gathered-exact lowering")

    mean, std = _shapes_stats()
    h = args.train_size
    w = 2 * h
    frames, labels = shapes.shapes_video(
        args.video_frames, (h, w), seed=args.seed + 2, speed=args.speed
    )
    frame_list = list(frames)
    thresh, drift_mean = _drift_thresh(frames)
    budget = dict(temporal_thresh=thresh,
                  temporal_budget=max(1, args.serve_batch // 4))

    def run_mode(p, bn, plans_, **kw):
        seg = VideoSegmenter(
            dict(p), dict(bn), spec, mean, std,
            batch=args.serve_batch, exec_plans=plans_, **kw,
        )
        return seg.run(frame_list, need_color=False)["ids"]

    calib = frames[:8]
    modes: dict[str, tuple] = {
        # (params, bn, plans, VideoSegmenter kwargs) — sparse_exact runs
        # first: it is the agreement baseline for every other row
        "sparse_exact": (r_params, r_bn, plans, {}),
        "dense_exact": (params, bn_state, None, {}),
        "sparse_budget": (r_params, r_bn, plans, dict(budget)),
        "sparse_int8": (r_params, r_bn, plans,
                        dict(quantize=True, calib_frames=calib)),
        "sparse_int8_budget": (r_params, r_bn, plans,
                               dict(budget, quantize=True,
                                    calib_frames=calib)),
    }
    if args.modes:
        keep = {m.strip() for m in args.modes.split(",")}
        keep.update(("dense_exact", "sparse_exact"))  # the two baselines
        modes = {k: v for k, v in modes.items() if k in keep}
    elif jax.default_backend() == "cpu":
        # same gate as stage_fidelity: XLA-CPU's naive int8 conv lowering
        dropped = [k for k in modes if "int8" in k]
        modes = {k: v for k, v in modes.items() if "int8" not in k}
        if dropped:
            print(f"compose: skipping {dropped} on the CPU backend "
                  "(naive int8 conv lowering; run on TPU or force with "
                  "--modes)")
    sparse_exact_ids = None
    rows = {}
    for name, (p, bn, plans_, kw) in modes.items():
        t0 = time.time()
        ids = run_mode(p, bn, plans_, **kw)
        if name == "sparse_exact":
            sparse_exact_ids = ids
        n = min(len(ids), len(labels))
        row = {"gt_miou": round(_gt_miou_from_ids(ids[:n], labels[:n]), 4),
               "wall_s": round(time.time() - t0, 1)}
        if sparse_exact_ids is not None:
            m = min(len(ids), len(sparse_exact_ids))
            row["ids_agreement_vs_sparse_exact"] = round(
                ids_agreement(np.stack(ids[:m]),
                              np.stack(sparse_exact_ids[:m])), 4)
        rows[name] = row
        print(f"compose {name}: {row}")
    _append_report(
        args.out,
        {
            "stage": "compose",
            "arch": args.arch,
            "weights": "trained-on-shapes, block128reg_87.5 recovered "
                       f"({rec_meta.get('miou_recovered')} mIoU at save)",
            "geometry": os.path.basename(regular_cfg),
            "video": {
                "frames": args.video_frames,
                "size": [h, w],
                "speed_px_per_frame": args.speed,
                "drift_mean_abs_delta": round(drift_mean, 2),
                "thresh_used": round(thresh, 2),
            },
            "modes": rows,
        },
    )


def stage_budget_curve(args) -> None:
    """GT-mIoU-vs-refresh-budget tradeoff surface for budgeted temporal.

    The per-axis fidelity matrix prices the budgeted mode at ONE point
    (K = serve_batch/4 on a 4 px/frame video: −30 GT mIoU, deliberately
    the worst case).  A single point invites the wrong conclusion
    ("temporal reuse is unusable on trained weights"); the real contract
    is a tunable curve — the budgeted program forwards exactly K of B
    frames per batch, so device compute scales ~K/B while accuracy
    degrades with the staleness the budget admits, which is a property
    of the CONTENT's drift rate, not of the model.  This stage measures
    that surface: for each drift speed in ``--speeds``, build the video,
    run the exact baseline once, then the budgeted mode at every K in
    ``--budget-ks`` — GT mIoU + ids agreement per (speed, K) point.

    This is the curve a deployment consults before enabling reuse (the
    per-video analog of `seg_video --temporal-report`); the reference's
    serving loop (`/root/reference/seg_video.py:280-285`) is the exact
    row.  Note K/B is the MAXIMUM refresh fraction: the budget program
    is threshold-gated first, so even K=B reuses sub-threshold frames
    (pure content-adaptive mode) and lands slightly below exact.
    """
    from tpuseg.ops.quant import ids_agreement
    from tpuseg.video.pipeline import VideoSegmenter

    params, bn_state, spec, _meta = _load_trained(args)
    mean, std = _shapes_stats()
    h = args.train_size
    w = 2 * h
    ks = [int(k) for k in args.budget_ks.split(",")]
    assert all(0 < k <= args.serve_batch for k in ks), (
        f"--budget-ks entries must be in 1..{args.serve_batch}"
    )
    speeds = [float(s) for s in args.speeds.split(",")]

    def run_mode(frame_list, **kw):
        seg = VideoSegmenter(
            dict(params), dict(bn_state), spec, mean, std,
            batch=args.serve_batch, **kw,
        )
        return seg.run(frame_list, need_color=False)["ids"]

    curves = {}
    for speed in speeds:
        frames, labels = shapes.shapes_video(
            args.video_frames, (h, w), seed=args.seed + 2, speed=speed
        )
        frame_list = list(frames)
        thresh, drift_mean = _drift_thresh(frames)
        exact_ids = run_mode(frame_list)
        n = min(len(exact_ids), len(labels))
        exact_miou = round(_gt_miou_from_ids(exact_ids[:n], labels[:n]), 4)
        points = {"exact": {"gt_miou": exact_miou, "max_refresh_fraction": 1.0}}
        print(f"budget_curve speed={speed}: exact {points['exact']}")
        for k in ks:
            ids = run_mode(frame_list, temporal_thresh=thresh,
                           temporal_budget=k)
            m = min(len(ids), len(exact_ids), len(labels))
            points[f"K={k}"] = {
                "gt_miou": round(_gt_miou_from_ids(ids[:m], labels[:m]), 4),
                "ids_agreement_vs_exact": round(
                    ids_agreement(np.stack(ids[:m]),
                                  np.stack(exact_ids[:m])), 4),
                "max_refresh_fraction": round(k / args.serve_batch, 4),
            }
            print(f"budget_curve speed={speed}: K={k} {points[f'K={k}']}")
        curves[f"speed={speed}"] = {
            "drift_mean_abs_delta": round(drift_mean, 2),
            "thresh_used": round(thresh, 2),
            "points": points,
        }
    _append_report(
        args.out,
        {"stage": "budget_curve", "arch": args.arch,
         "weights": "trained-on-shapes (dense; compose showed the "
                    "temporal cost is weight-path-invariant)",
         "video": {"frames": args.video_frames, "size": [h, w],
                   "serve_batch": args.serve_batch},
         "curves": curves},
    )


def stage_cls(args) -> None:
    import jax
    import jax.numpy as jnp

    from tpuseg.cli.expander_batch import generate_rbgp_config
    from tpuseg.models.factory import create_model
    from tpuseg.sparsity import create_masker
    from tpuseg.sparsity.base import apply_masks
    from tpuseg.train import create_train_state, make_cls_train_step, make_sgd
    from tpuseg.train.trainer import classifier_forward

    arch = "cifar_resnet20"
    params, state, spec, _kw = create_model(
        jax.random.key(args.seed), "cifar10", arch
    )
    tx = make_sgd(0.1, momentum=0.9, weight_decay=1e-4)
    rng = np.random.default_rng(args.seed + 10)
    val_rng = np.random.default_rng(args.seed + 11)
    val_x, val_y = shapes.sample_cls_batch(val_rng, 1024)

    fwd = classifier_forward(spec, jnp.bfloat16)
    fwd_jit = jax.jit(lambda p, bn, x: fwd(p, bn, x, train=False)[0])

    def accuracy(p, bn) -> float:
        correct = 0
        for i in range(0, len(val_x), 256):
            logits = fwd_jit(p, bn, jnp.asarray(val_x[i : i + 256]))
            correct += int(
                (np.asarray(jnp.argmax(logits, -1)) == val_y[i : i + 256]).sum()
            )
        return correct / len(val_x)

    def train(p, bn, *, masks, steps, teacher, log_prefix):
        step_fn = jax.jit(
            make_cls_train_step(spec, tx, teacher=teacher)
        )
        st = create_train_state(p, bn, tx, masks=masks)
        for step in range(1, steps + 1):
            x, y = shapes.sample_cls_batch(rng, 128)
            st, m = step_fn(st, jnp.asarray(x), jnp.asarray(y))
            if step % args.eval_every == 0 or step == steps:
                print(
                    f"{log_prefix} step {step}: "
                    f"loss={float(np.asarray(m['loss'])):.3f} "
                    f"batch_acc={float(np.asarray(m['acc'])):.3f}"
                )
        return st.params, st.bn_state

    t_params, t_bn = train(
        params, state, masks=None, steps=args.cls_steps, teacher=None,
        log_prefix="teacher",
    )
    teacher_acc = accuracy(t_params, t_bn)

    cfg = generate_rbgp_config(
        {k: np.asarray(v) for k, v in t_params.items()}, arch,
        oblock=(16, 16), cblock=(8, 8), iblock=(1, 1), osp=0.0, isp=0.5,
    )
    masks = create_masker(cfg, seed=args.seed).generate_masks(t_params)
    pruned = apply_masks(
        {k: np.asarray(v) for k, v in t_params.items()},
        {k: np.asarray(v) for k, v in masks.items()},
    )
    acc_at_mask = accuracy(pruned, t_bn)

    def t_forward(tp, tbn, images):
        logits, _ = fwd(tp, tbn, images, train=False)
        return logits

    results = {"teacher_acc": round(teacher_acc, 4),
               "acc_at_mask_50pct": round(acc_at_mask, 4)}
    for name, teacher in (
        ("retrain_plain", None),
        ("retrain_kd", (t_forward, t_params, t_bn)),
    ):
        p2, bn2 = train(
            pruned, t_bn, masks=masks, steps=args.recover_steps,
            teacher=teacher, log_prefix=name,
        )
        results[name + "_acc"] = round(accuracy(p2, bn2), 4)
        print(f"cls {name}: {results[name + '_acc']}")
    _append_report(
        args.out,
        {"stage": "cls", "arch": arch, "weights": "trained-on-shapes-cls",
         **results},
    )


def main(argv=None):
    # SIGUSR2 dumps all thread stacks without killing the run (long CPU
    # stages are opaque otherwise)
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR2, chain=True)
    except (AttributeError, ValueError):
        pass
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--stage", default="all",
                   choices=["train", "fidelity", "compress", "compose",
                            "budget_curve", "cls", "all"])
    p.add_argument("--out", default="runs/fidelity")
    p.add_argument("--arch", default="drn_d_22")
    p.add_argument("--train-size", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--recover-steps", type=int, default=300)
    p.add_argument("--cls-steps", type=int, default=500)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--target-miou", type=float, default=93.0,
                   help="early-stop val mIoU, in PERCENT (miou_from_hist)")
    p.add_argument("--video-frames", type=int, default=96)
    p.add_argument("--speed", type=float, default=4.0)
    p.add_argument("--serve-batch", type=int, default=8)
    p.add_argument("--variants", default=None,
                   help="comma list restricting the compress-stage mask "
                        "variants (default: all)")
    p.add_argument("--sparse-exec", action="store_true",
                   help="compress stage: run mask recovery through the "
                        "REAL fused-kernel sparse train step (the "
                        "`semantic_seg train --sparse-exec` path) instead "
                        "of masked-dense — eligible layers only, see "
                        "tpuseg.ops.sparse_train")
    p.add_argument("--modes", default=None,
                   help="comma list restricting the fidelity mode matrix "
                        "(exact always runs as the baseline)")
    p.add_argument("--budget-ks", default="1,2,4",
                   help="budget_curve stage: comma list of refresh budgets "
                        "K (frames forwarded per serve batch)")
    p.add_argument("--speeds", default="1.0,4.0",
                   help="budget_curve stage: comma list of drift speeds "
                        "(px/frame) to measure the curve at")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    stages = (
        ["train", "fidelity", "compress", "compose", "cls"]
        if args.stage == "all"
        else [args.stage]
    )
    for s in stages:
        {"train": stage_train, "fidelity": stage_fidelity,
         "compress": stage_compress, "compose": stage_compose,
         "budget_curve": stage_budget_curve, "cls": stage_cls}[s](args)


if __name__ == "__main__":
    main()
