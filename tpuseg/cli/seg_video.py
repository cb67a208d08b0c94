"""Video segmentation demo CLI.

Parity with /root/reference/seg_video.py, seg_video_new.py (batched),
seg_video_no_plot.py (pure-inference timing) and plot_pyqt.py (fps counter):
decode a driving video, run DRNSeg per batch, argmax -> palette -> overlay,
save PNGs and report fps.

Usage:
  python -m tpuseg.cli.seg_video --video sample.mp4 --frames 25 \
      --arch drn_d_22 --classes 19 [--pretrained ckpt.npz|ckpt.pth] \
      [--size 300x300] [--batch 8] [--save-dir out/] [--overlay]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tpuseg video segmentation demo")
    p.add_argument("--video", required=True,
                   help="video file path, or the built-in synthetic source "
                        "'shapes[:seed]' (tpuseg.data.shapes moving-shapes "
                        "world, generated at --size) — a zero-asset demo "
                        "that needs no video file or codec")
    p.add_argument("--arch", default="drn_d_22")
    p.add_argument("--classes", type=int, default=19)
    p.add_argument("--pretrained", default=None, help=".npz or .pth checkpoint")
    p.add_argument("--frames", type=int, default=25,
                   help="number of frames (reference demos use 25)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", default="300x300",
                   help="HxW resize, e.g. 300x300 (reference) or 1024x2048")
    p.add_argument("--save-dir", default=None, help="save pred_i.png overlays")
    p.add_argument("--overlay", action="store_true",
                   help="blend prediction over the frame (seg_video overlay)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--quantize", action="store_true",
                   help="int8 serving mode: run the MXU-roofline stages "
                        "(4-8, stride-1 convs with >=128 channels) "
                        "quantized (symmetric PTQ, per-channel "
                        "weight scales; tpuseg.ops.quant).  Changes "
                        "numerics — ids typically agree with bf16 on "
                        ">99%% of pixels")
    p.add_argument("--pr-config-path", default=None,
                   help="serve a PRUNED model: generate masks from this "
                        "reference-schema JSON pruner config (e.g. "
                        "optimal_configs/drn_d_22/*.json), apply them, and "
                        "execute eligible layers via the sparse lowering "
                        "(int8 sparse kernels with --quantize)")
    p.add_argument("--sparse-lowering", default="gathered",
                   choices=("gathered", "pallas"),
                   help="sparse execution family for --pr-config-path: "
                        "'gathered' (channel-gather + small dense XLA "
                        "convs — 1.63x model bf16 at 87.5%% uniform "
                        "masks, up to 5.5x on skewed supports with the "
                        "exact mode; round-4 hardware record) or "
                        "'pallas' (fused block-sparse kernels, "
                        "1.25x/1.38x)")
    p.add_argument("--gathered-mode", default="exact",
                   choices=("exact", "split"),
                   help="gathered-lowering execution form: 'exact' "
                        "(per-out-block exact supports; dead out-blocks "
                        "emit zeros with no conv) or 'split' (uniform "
                        "repeat-padded supports)")
    p.add_argument("--quantize-stem", action="store_true",
                   help="with --quantize: run the three polyphase stem "
                        "convs in int8 too (frontend measured 1.12x — "
                        "bench_sparse --frontend).  conv0's activation "
                        "scale is analytic (exact normalize bounds); the "
                        "others calibrate with --calibrate or fall back "
                        "to dynamic per-frame scales")
    p.add_argument("--calibrate", type=int, default=0, metavar="N",
                   help="with --quantize: calibrate static activation "
                        "scales on the first N frames (removes the "
                        "per-conv absmax reduction; 153.8 -> 165.6 fps)")
    p.add_argument("--host-resize", action="store_true",
                   help="resize frames to --size on the host during decode "
                        "(cv2 bilinear, exactly the reference demos' "
                        "behavior).  NOTE: the DEFAULT differs from the "
                        "reference — frames decode at native resolution "
                        "and are resized on device (jax.image.resize), "
                        "shipping far fewer bytes when the source is "
                        "smaller than --size; predictions may differ "
                        "slightly from the host-resize path.  Pass this "
                        "flag for bit-parity with the reference demos")
    p.add_argument("--transport", default="rgb", choices=["rgb", "yuv420"],
                   help="frame bytes over the host->device link: rgb "
                        "(3 B/px) or planar yuv420 (1.5 B/px, reconstructed "
                        "to RGB on device — tpuseg.video.yuv).  yuv420 is "
                        "the right call on slow links (tunneled/remote "
                        "chips); chroma is 2x2-subsampled so ids can "
                        "differ slightly at color edges")
    p.add_argument("--ids-pack", type=int, default=None, metavar="BITS",
                   help="pack fetched class ids to BITS bits/px on device "
                        "(tpuseg.ops.idpack; EXACT — host unpacks before "
                        "any output).  The D2H ids fetch is the e2e "
                        "bottleneck on remote-attached chips; 19 classes "
                        "fit in 5 bits (1.6x fewer link bytes), <=16 in 4 "
                        "(2x).  Needs --size width divisible by 8; "
                        "ids-only fetch mode (not --device-outputs).  "
                        "Default: AUTO — packs whenever eligible and "
                        "classes <= 32 (measured +30%% e2e over yuv420 "
                        "alone on the tunneled link, bit-exact; round-4 "
                        "hardware record); pass 0 to disable, 8 for "
                        "unpacked bytes")
    p.add_argument("--device-outputs", action="store_true",
                   help="colorize/overlay on device and fetch RGB frames "
                        "(best on PCIe-attached chips; default fetches "
                        "1-byte/px ids and reconstructs color on host)")
    p.add_argument("--device-fps", action="store_true",
                   help="also report pure device throughput at --size "
                        "(on-device loop, dispatch-overhead-immune)")
    p.add_argument("--temporal", type=int, default=1, metavar="N",
                   help="temporal-reuse serving mode: run the network only "
                        "on every Nth frame (keyframes); frames in between "
                        "reuse the preceding keyframe's class ids — device "
                        "compute drops ~Nx.  APPROXIMATE: fidelity depends "
                        "on scene motion; measure it with --temporal-report")
    p.add_argument("--temporal-thresh", type=float, default=None, metavar="T",
                   help="ADAPTIVE temporal-reuse serving mode (instead of "
                        "the fixed --temporal N cadence): each frame "
                        "computes an in-graph mean-|pixel delta| against "
                        "the last keyframe and runs the network only when "
                        "it exceeds T (0..255 units; driving video "
                        "inter-frame deltas are typically 2-8).  Static "
                        "stretches cost ~no compute; cuts/motion promote "
                        "immediately.  Reports promotion_rate; measure "
                        "fidelity with --temporal-report")
    p.add_argument("--temporal-warp", action="store_true",
                   help="with --temporal N, or with --temporal-thresh + "
                        "--temporal-budget: motion-compensate the reused "
                        "ids instead of copying them — per-block shifts "
                        "estimated keyframe->frame on pooled luma (block "
                        "matching, one SAD volume per batch, evidence-"
                        "gated) and the keyframe's ids shifted along "
                        "them.  Same keyframe compute; recovers agreement "
                        "lost to motion on translation-dominant content "
                        "(measured +0.9-1.3pt on sample.mp4, neutral on "
                        "slow scenes).  Target dims must divide 128")
    p.add_argument("--temporal-nearest", action="store_true",
                   help="with --temporal N, or with --temporal-thresh + "
                        "--temporal-budget: bidirectional reuse — each "
                        "non-key frame takes ids from the NEAREST keyframe "
                        "behind OR ahead within the batch instead of the "
                        "preceding one.  Zero extra compute (all keyframes "
                        "come out of the same batched forward) and no "
                        "added latency (batched serving already buffers "
                        "the batch); halves the max reuse distance, which "
                        "is where temporal modes pay accuracy on moving "
                        "boundaries.  Composes with --temporal-warp")
    p.add_argument("--temporal-budget", type=int, default=None, metavar="K",
                   help="with --temporal-thresh: budgeted batch promotion "
                        "— a cheap diff scan picks up to K content-chosen "
                        "keyframes per batch and ONE batched K-frame "
                        "forward serves them (static compute at batched "
                        "MXU efficiency, ~batch/K x the full rate); "
                        "beyond-budget changes promote next batch")
    p.add_argument("--temporal-autotune", type=float, default=None,
                   metavar="A",
                   help="agreement-targeted AUTOTUNING across ALL temporal "
                        "modes: on a --autotune-frames calibration prefix, "
                        "run exact serving plus a cheapest-first ladder of "
                        "fixed-N cadences (N=8/4/2, each with its free "
                        "+nearest variant) and budgeted configs (threshold "
                        "from the prefix's own drift scale, budgets "
                        "~1/8..3/4 of --batch), and serve with the CHEAPEST "
                        "candidate whose ids agreement vs exact is >= A "
                        "(0..1).  Falls back to exact serving when no "
                        "candidate qualifies.  Replaces --temporal/"
                        "--temporal-thresh/--temporal-budget; composes with "
                        "--quantize, --pr-config-path; a user-passed "
                        "--temporal-warp/--temporal-nearest rides every "
                        "candidate.  Costs one compile per evaluated "
                        "candidate up front (once per stream; cheapest-"
                        "first stops early on slow content)")
    p.add_argument("--autotune-frames", type=int, default=32, metavar="M",
                   help="calibration prefix length for --temporal-autotune "
                        "(>= --batch; longer prefixes sample more of the "
                        "content's motion)")
    p.add_argument("--temporal-report", action="store_true",
                   help="with --temporal N / --temporal-thresh T: also run "
                        "the exact per-frame pipeline on the same frames "
                        "and report ids_agreement (fraction of pixels "
                        "whose class id matches the full computation) and "
                        "both fps")
    p.add_argument("--mesh-devices", type=int, default=0, metavar="N",
                   help="serve data-parallel over the first N local devices "
                        "(batch-dim sharding over a Mesh('data'); N must "
                        "divide --batch; 0 = single device).  Not combinable "
                        "with --pr-config-path or --temporal-thresh")
    p.add_argument("--mean", default="0.290,0.328,0.287")
    p.add_argument("--std", default="0.183,0.187,0.184")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of the run "
                        "into this directory (TensorBoard/Perfetto)")
    return p.parse_args(argv)


def _build_mesh(n: int):
    if not n:
        return None
    import jax
    from jax.sharding import Mesh

    from tpuseg.parallel.mesh import configure_backend_from_env

    configure_backend_from_env()
    devs = jax.devices()[:n]
    assert len(devs) == n, f"asked for {n} devices, have {len(jax.devices())}"
    return Mesh(np.asarray(devs), ("data",))


def load_model(args):
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.models.drn import build_drn_spec

    if args.pretrained and args.pretrained.endswith(".pth"):
        from tpuseg.models.torch_import import load_pth

        params, state, _ = load_pth(args.pretrained)
        spec = build_drn_spec(args.arch, num_classes=0, naming="seg")
    elif args.pretrained:
        from tpuseg.train import load_checkpoint

        params, state, _, _, _ = load_checkpoint(args.pretrained)
        spec = build_drn_spec(args.arch, num_classes=0, naming="seg")
    else:
        params, state, spec = init_drnseg(0, args.arch, args.classes)
    return params, state, spec


_SHAPES_CACHE: dict = {}


def _resolve_ids_pack(args, w: int) -> int | None:
    """``--ids-pack`` policy: explicit BITS wins (0 disables), else AUTO —
    pack whenever the ids-only fetch is in play (not --device-outputs),
    the width is 8-divisible, and the class count fits 5 bits or fewer.
    Bit-exact either way (tpuseg.ops.idpack round-trips identically);
    measured +30% e2e over yuv420 alone on the tunneled link (round-4
    hardware record, e2e_idpack)."""
    if args.ids_pack is not None:
        return args.ids_pack if args.ids_pack > 0 else None
    if args.device_outputs or w % 8:
        return None
    bits = max(1, (args.classes - 1).bit_length())
    if bits > 5:
        return None
    print(json.dumps({"event": "ids_pack_auto", "bits": bits,
                      "classes": args.classes}))
    return bits


def _is_shapes(video: str) -> bool:
    return video == "shapes" or video.startswith("shapes:")


def open_frames(args, h: int, w: int, *, resized: bool, fmt: str = "rgb"):
    """Frame source for ``args.video``: a decoded file (FrameSource) or the
    built-in ``shapes[:seed]`` synthetic video (generated at h x w, so
    ``resized`` is moot for it).  Returns an iterable of HxWx3 uint8 (or
    packed I420 planes with ``fmt="i420"``)."""
    from tpuseg.video import FrameSource

    if not _is_shapes(args.video):
        if not os.path.exists(args.video):
            raise SystemExit(f"error: video file not found: {args.video}")
        return FrameSource(args.video, size=(h, w) if resized else None,
                           fmt=fmt)
    seed = int(args.video.split(":", 1)[1]) if ":" in args.video else 0
    n = max(
        args.frames or 0,
        getattr(args, "calibrate", 0) or 0,
        # autotune consumes a calibration prefix of its own — generate
        # enough synthetic frames for it (real videos stream regardless)
        (max(getattr(args, "autotune_frames", 0) or 0,
             getattr(args, "batch", 1))
         if getattr(args, "temporal_autotune", None) is not None else 0),
        1,
    )
    key = (seed, n, h, w)
    if key not in _SHAPES_CACHE:
        from tpuseg.data.shapes import shapes_video

        _SHAPES_CACHE.clear()  # hold at most one generated video
        _SHAPES_CACHE[key] = shapes_video(n, (h, w), seed=seed)[0]
    return list(_SHAPES_CACHE[key])


def main(argv=None):
    args = parse_args(argv)
    import jax.numpy as jnp

    from tpuseg.video import VideoSegmenter

    h, w = (int(v) for v in args.size.lower().split("x"))
    mean = [float(v) for v in args.mean.split(",")]
    std = [float(v) for v in args.std.split(",")]

    params, state, spec = load_model(args)
    exec_plans = None
    if args.pr_config_path:
        from tpuseg.models.sparse_exec import build_sparse_plans
        from tpuseg.ops.fold_bn import fold_bn
        from tpuseg.sparsity import apply_masks, create_masker

        masker = create_masker(args.pr_config_path, seed=0)
        masks = masker.generate_masks(params, is_static=True, verbose=False)
        params = dict(apply_masks(params, masks))
        # plans are packed from the BN-folded masked weights — the same
        # values VideoSegmenter's own fold produces from (params, state).
        # With --quantize, VideoSegmenter lifts these to the int8 sparse
        # kernels itself (after calibration, so static scales reach them).
        folded = fold_bn(params, state, spec)
        exec_plans, report = build_sparse_plans(
            folded, masks, spec, lowering=args.sparse_lowering,
            gathered_mode=args.gathered_mode,
        )
        n_sparse = sum(1 for v in report.values() if not v.startswith("dense"))
        print(json.dumps({"event": "sparse_plans", "lowered": n_sparse,
                          "total_masked": len(report),
                          "lowering": args.sparse_lowering,
                          "gathered_mode": args.gathered_mode}))
    calib = None
    if args.quantize and args.calibrate > 0:
        # match the serving transform: in device-resize mode (the default),
        # feed DECODE-resolution frames — VideoSegmenter resizes them with
        # the same jax.image.resize the serving program applies, so static
        # scales are calibrated on the pixels the model will actually see
        # (host cv2 resize differs slightly; round-4 review)
        calib = [f for _, f in zip(range(args.calibrate),
                                   open_frames(args, h, w,
                                               resized=args.host_resize))]
    # resolve the ids-pack policy ONCE: _resolve_ids_pack prints the
    # machine-read ids_pack_auto event, and the autotune block below
    # builds several throwaway segmenters — per-call resolution would
    # duplicate the event line in harvested stdout
    ids_bits = _resolve_ids_pack(args, w)
    autotune_res = None
    if args.temporal_autotune is not None:
        if (args.temporal > 1 or args.temporal_thresh is not None
                or args.temporal_budget is not None):
            raise SystemExit(
                "error: --temporal-autotune replaces --temporal/"
                "--temporal-thresh/--temporal-budget"
            )
        if args.mesh_devices:
            raise SystemExit(
                "error: --temporal-autotune not combinable with "
                "--mesh-devices (budgeted mode is single-device)"
            )
        from tpuseg.video.autotune import autotune_budget

        def _make_segmenter(**temporal_kw):
            if temporal_kw:
                # candidates are measured in the exact configuration that
                # will serve, warp/nearest included; the exact baseline
                # carries no temporal options
                temporal_kw.setdefault("temporal_warp", args.temporal_warp)
                temporal_kw.setdefault("temporal_nearest",
                                       args.temporal_nearest)
            return VideoSegmenter(
                params, state, spec, mean, std,
                compute_dtype=(jnp.bfloat16 if args.dtype == "bfloat16"
                               else None),
                batch=args.batch,
                device_outputs=args.device_outputs,
                target_size=None if args.host_resize else (h, w),
                quantize=args.quantize,
                quantize_stem=args.quantize and args.quantize_stem,
                calib_frames=calib,
                exec_plans=exec_plans,
                transport=args.transport,
                ids_bits=ids_bits,
                **temporal_kw,
            )

        cal_frames = [
            f for _, f in zip(
                range(max(args.autotune_frames, args.batch)),
                open_frames(args, h, w, resized=args.host_resize),
            )
        ]
        autotune_res = autotune_budget(
            _make_segmenter, cal_frames,
            target_agreement=args.temporal_autotune, batch=args.batch,
            # a user-forced --temporal-nearest already rides every
            # candidate via the setdefault above; generating explicit
            # +nearest variants would duplicate them
            include_nearest=not args.temporal_nearest,
        )
        print(json.dumps({"event": "temporal_autotune", **autotune_res}))
        ck = autotune_res["choice_kwargs"]
        if ck:
            args.temporal = ck.get("temporal_interval", 1)
            args.temporal_thresh = ck.get("temporal_thresh")
            args.temporal_budget = ck.get("temporal_budget")
            args.temporal_nearest = (args.temporal_nearest
                                     or ck.get("temporal_nearest", False))
            args.temporal_warp = (args.temporal_warp
                                  or ck.get("temporal_warp", False))
        else:
            # exact serving: warp/nearest only apply to temporal modes
            args.temporal_warp = False
            args.temporal_nearest = False
    seg = VideoSegmenter(
        params,
        state,
        spec,
        mean,
        std,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        batch=args.batch,
        want_overlay=args.overlay,
        device_outputs=args.device_outputs,
        target_size=None if args.host_resize else (h, w),
        quantize=args.quantize,
        quantize_stem=args.quantize and args.quantize_stem,
        calib_frames=calib,
        exec_plans=exec_plans,
        temporal_interval=args.temporal,
        temporal_thresh=args.temporal_thresh,
        temporal_budget=args.temporal_budget,
        temporal_warp=args.temporal_warp,
        temporal_nearest=args.temporal_nearest,
        mesh=_build_mesh(args.mesh_devices),
        transport=args.transport,
        ids_bits=ids_bits,
    )
    # with the yuv420 transport, real videos decode straight to packed
    # I420 planes (the native decoder emits them with no RGB detour) —
    # the shapes source and overlay-saving runs keep RGB on the host
    main_fmt = ("i420" if args.transport == "yuv420"
                and not _is_shapes(args.video) and not args.save_dir
                else "rgb")
    frames = open_frames(args, h, w, resized=args.host_resize, fmt=main_fmt)
    from tpuseg.metrics.profiling import trace

    with trace(args.profile_dir):
        # colorized frames are only materialized when they are saved —
        # ids alone are 1 byte/px and the palette gather is reproducible
        result = seg.run(frames, max_frames=args.frames,
                         need_color=bool(args.save_dir))
    if result["frames"] == 0:
        raise SystemExit(f"error: no frames decoded from {args.video}")

    if args.save_dir:
        from PIL import Image

        os.makedirs(args.save_dir, exist_ok=True)
        for i, img in enumerate(result["color"]):
            Image.fromarray(img).save(os.path.join(args.save_dir, f"pred_{i}.png"))

    line = {
        "frames": result["frames"],
        "seconds": round(result["seconds"], 4),
        "fps": round(result["fps"], 2),
        "size": f"{h}x{w}",
        "arch": args.arch,
    }
    if args.temporal > 1:
        line["temporal_interval"] = args.temporal
        if args.temporal_warp:
            line["temporal_warp"] = True
        if args.temporal_nearest:
            line["temporal_nearest"] = True
    if autotune_res is not None:
        line["autotune_target"] = args.temporal_autotune
        line["autotune_choice"] = autotune_res["choice"]
        line["autotune_budget"] = autotune_res["temporal_budget"]
    if args.temporal_thresh is not None:
        line["temporal_thresh"] = args.temporal_thresh
        line["promotion_rate"] = round(result["promotion_rate"], 4)
        if args.temporal_budget is not None:
            line["temporal_budget"] = args.temporal_budget
            if args.temporal_warp:
                line["temporal_warp"] = True
            if args.temporal_nearest:
                line["temporal_nearest"] = True
    if args.device_fps:
        if args.temporal_thresh is not None:
            # adaptive device rate is content-dependent: measure on the
            # decoded frames themselves (fresh carry, so the report is
            # independent of the streaming run above)
            frames3 = [
                f for _, f in zip(
                    range(args.frames),
                    open_frames(args, h, w, resized=args.host_resize),
                )
            ]
            dev = seg.benchmark_adaptive_device_fps(frames3)
            line["device_fps"] = round(dev["device_fps"], 2)
            line["device_promotion_rate"] = round(dev["promotion_rate"], 4)
        else:
            line["device_fps"] = round(seg.benchmark_device_fps((h, w)), 2)
    if args.temporal_report and (
        args.temporal > 1 or args.temporal_thresh is not None
    ):
        # fidelity: the exact per-frame run on the SAME frames
        from tpuseg.ops.quant import ids_agreement

        seg_full = VideoSegmenter(
            params, state, spec, mean, std,
            compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
            batch=args.batch, want_overlay=args.overlay,
            device_outputs=args.device_outputs,
            target_size=None if args.host_resize else (h, w),
            quantize=args.quantize,
            quantize_stem=args.quantize and args.quantize_stem,
            calib_frames=calib,
            exec_plans=exec_plans,
        )
        frames2 = open_frames(args, h, w, resized=args.host_resize)
        full = seg_full.run(frames2, max_frames=args.frames, need_color=False)
        n = min(len(result["ids"]), len(full["ids"]))
        line["temporal_ids_agreement"] = round(
            ids_agreement(result["ids"][:n], full["ids"][:n]), 4
        )
        line["full_fps"] = round(full["fps"], 2)
        if args.device_fps:
            line["full_device_fps"] = round(
                seg_full.benchmark_device_fps((h, w)), 2
            )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
