"""Video segmentation pipeline: decode -> device -> fused inference -> overlay.

Behavioral reference: the reference's video demos (/root/reference/
seg_video.py, seg_video_new.py, seg_video_no_plot.py, plot_pyqt.py):
per-frame or 25-frame-batched DRNSeg forward, argmax to class ids, palette
colorize, overlay.  Their loop crosses the host/device boundary twice per
frame (H2D input, D2H argmax; SURVEY.md §3.3).

TPU-native redesign:
- the whole per-batch program (uint8 -> normalize -> DRNSeg -> upsample ->
  argmax -> palette -> overlay blend) is ONE jitted device program; only
  uint8 frames go up and uint8 ids/overlays come down;
- frames are double-buffer prefetched to the device while the previous batch
  computes;
- batching amortizes dispatch overhead (critical over remote-dispatch links
  where each call costs ~50 ms).
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from tpuseg.data.cityscapes import CITYSCAPE_PALETTE
from tpuseg.metrics.meters import FpsMeter
from tpuseg.models.drn import DrnSpec
from tpuseg.models.drnseg import drnseg_forward


def _plan_gspmd_safe(plan) -> bool:
    """True when a per-conv execution plan lowers to pure XLA ops (so
    GSPMD can partition it over a serving mesh).  Pallas-backed plans are
    opaque custom calls and must stay single-device."""
    from tpuseg.ops.gathered_conv import GatheredGroupConv, GatheredGroupConvQ
    from tpuseg.ops.quant import QuantConv
    from tpuseg.ops.rbgp_matmul import RbgpPlan

    return isinstance(
        plan, (GatheredGroupConv, GatheredGroupConvQ, QuantConv, RbgpPlan)
    )


class FrameSource:
    """Decode frames from a video file, resized to (height, width) RGB uint8
    (reference: FrameCapture decode loop, seg_video.py:113-139).

    Prefers the native threaded decoder (ffmpeg frame-threaded decode +
    swscale/cv::resize worker pool + ring buffer, native/videodec.cpp) which
    runs off the GIL so host decode never steals time from device dispatch;
    falls back to cv2, then imageio."""

    def __init__(self, path: str, size: tuple[int, int] | None = None,
                 native: bool = True, fmt: str = "rgb"):
        self.path = path
        self.size = size  # (height, width)
        self.native = native
        # fmt="i420": yield packed (H*3/2, W) chroma-subsampled planes —
        # the decoder's native format, for VideoSegmenter's yuv420
        # transport.  The native decoder emits them directly (no RGB
        # detour); the cv2/imageio fallbacks convert per frame on the host.
        assert fmt in ("rgb", "i420"), fmt
        self.fmt = fmt

    def __iter__(self) -> Iterator[np.ndarray]:
        if self.native:
            try:
                from tpuseg.video.native_source import (
                    NativeFrameSource,
                    available,
                )

                if available():
                    yield from NativeFrameSource(self.path, self.size,
                                                 fmt=self.fmt)
                    return
            except (RuntimeError, FileNotFoundError):
                pass  # fall back to cv2 below
        if self.fmt == "i420":
            from tpuseg.video.yuv import rgb_to_i420

            for frame in FrameSource(self.path, self.size, native=False):
                h, w = frame.shape[:2]
                frame = frame[: h // 4 * 4, : w // 2 * 2]  # packing grid
                yield rgb_to_i420(frame)[0]
            return
        try:
            import cv2

            cap = cv2.VideoCapture(self.path)
            try:
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    if self.size is not None:
                        h, w = self.size
                        frame = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
                    yield frame
            finally:
                cap.release()
            return
        except ImportError:
            pass
        import imageio.v3 as iio
        from PIL import Image

        for frame in iio.imiter(self.path):
            if self.size is not None:
                h, w = self.size
                frame = np.asarray(
                    Image.fromarray(frame).resize((w, h), Image.BILINEAR)
                )
            yield np.asarray(frame, dtype=np.uint8)


class SyntheticFrames:
    """Deterministic frame generator for tests/benchmarks (no codec dep)."""

    def __init__(self, n: int, size: tuple[int, int], seed: int = 0):
        self.n = n
        self.size = size
        self.seed = seed

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        h, w = self.size
        for _ in range(self.n):
            yield rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class VideoSegmenter:
    """Jitted end-to-end video segmentation program."""

    def __init__(
        self,
        params,
        bn_state,
        spec: DrnSpec,
        mean,
        std,
        *,
        compute_dtype=jnp.bfloat16,
        batch: int = 8,
        palette: np.ndarray = CITYSCAPE_PALETTE,
        want_overlay: bool = False,
        fused_upsample: bool = True,
        fold_batchnorm: bool = True,
        device_outputs: bool = False,
        target_size: tuple[int, int] | None = None,
        quantize: bool = False,
        quantize_stem: bool = False,
        calib_frames=None,
        exec_plans=None,
        temporal_interval: int = 1,
        temporal_thresh: float | None = None,
        temporal_budget: int | None = None,
        temporal_warp: bool = False,
        temporal_nearest: bool = False,
        mesh=None,
        transport: str = "rgb",
        ids_bits: int | None = None,
    ):
        # ``temporal_interval=N`` exploits temporal redundancy (the
        # DeltaCNN observation: consecutive video frames change sparsely):
        # only every Nth frame of a batch runs the network ("keyframe");
        # the frames in between reuse the preceding keyframe's class ids.
        # The device program computes B/N forwards per B-frame batch, so
        # device rate scales ~N-fold.  APPROXIMATE — report fidelity as
        # ids_agreement vs the full per-frame run (seg_video --temporal N
        # --temporal-report); agreement depends on scene motion per frame
        # interval, so it is a property of the video, not the model.
        # ``temporal_thresh=T`` is the ADAPTIVE variant (BACKLOG round-3
        # item 3: keyframe promotion on an in-graph change metric): the
        # device program scans the batch frame-by-frame carrying the last
        # keyframe; each frame computes a full-resolution mean-absolute
        # pixel difference against it (u8->i16 subtract + reduce, ~free
        # next to a forward) and a ``lax.cond`` either promotes the frame
        # (full single-frame forward, becomes the new keyframe) or reuses
        # the keyframe's ids.  Keyframes therefore align to CONTENT
        # changes instead of a fixed cadence: static stretches cost ~0
        # compute per frame, cuts/motion promote immediately — better
        # fidelity at the same compute than interval mode, with the same
        # jit-static program (both cond branches have fixed shapes).  T is
        # in mean-|delta| units of 0..255 pixel values (measure a video's
        # scale with --temporal-report; driving video inter-frame deltas
        # are typically 2-8).  Mutually exclusive with temporal_interval.
        # ``temporal_budget=K`` (with temporal_thresh) is the BUDGETED
        # batch variant — the one that wins on MXU.  Measured round 3: the
        # sequential cond-per-frame program pays batch-1 forward
        # efficiency (102 vs 116.5 fps equivalent), so on uniformly-moving
        # video fixed intervals beat it at equal agreement (N=4: 415 fps
        # @96.1% vs thresh-8: 322 @96.0% on Road_1101).  The budgeted
        # variant keeps the content-adaptive keyframe CHOICE but batches
        # the compute: a cheap sequential diff scan (pixel traffic only,
        # no forwards) selects up to K promotion frames per batch, ONE
        # batched K-frame forward computes their ids, and every frame
        # gathers its keyframe's ids.  Compute is static (K forwards per
        # B frames -> device rate ~ B/K x the batched rate) while
        # keyframes still land exactly where the content changes; beyond-
        # budget changes wait for the next batch (bounded staleness).
        # ``temporal_nearest=True`` upgrades reuse in the BATCHED modes
        # (interval, budgeted) from forward-only to BIDIRECTIONAL: a
        # non-key frame takes ids from the nearest keyframe in either
        # direction within the batch (ties break causal/backward).  All
        # keyframes of a batch come out of the same batched forward, so
        # looking ahead costs zero extra compute — only the id gather's
        # index mapping changes — and batched serving already buffers the
        # whole batch, so no latency is added either.  Max reuse distance
        # drops from N-1 to floor(N/2) (interval mode), which matters on
        # trained weights: boundary-band staleness is where temporal
        # modes pay GT-mIoU (PERF_NOTES round 4).  Off by default so
        # agreement numbers stay comparable with the causal semantics;
        # not applicable to the sequential adaptive mode (a scan cannot
        # see future frames).
        # ``exec_plans`` serves a compressed model: a per-conv execution
        # plan dict from tpuseg.models.sparse_exec.build_sparse_plans
        # (block-sparse Pallas kernels), optionally lifted to int8 with
        # quantize_sparse_plans, and/or tpuseg.ops.quant.build_quant_plans.
        # With ``quantize=True`` the remaining dense eligible convs are
        # PTQ-quantized and merged in.
        # ``quantize=True`` runs the MXU-roofline stages (4-8) in int8
        # (symmetric PTQ, per-channel weight scales — tpuseg.ops.quant).
        # Activation scales are dynamic (in-graph absmax) by default;
        # passing ``calib_frames`` (target-resolution uint8 frames)
        # calibrates static scales, which removes the per-conv reduction:
        # 153.8 -> 165.6 fps at 1024x2048 batch 8 on v5e.  Opt-in serving
        # mode: ids typically agree with bf16 on >99% of pixels (report
        # with tpuseg.ops.quant.ids_agreement).
        # ``target_size=(H, W)`` resizes frames to (H, W) ON DEVICE
        # (bilinear, half-pixel centers — cv2.INTER_LINEAR's convention)
        # before the stem.  Feeding decode-native frames and upscaling on
        # device cuts H2D volume by the scale factor squared (a 640x360
        # source at 1024x2048 ships 5.5 MB instead of 48 MB per 8-frame
        # batch) and drops the host resize work entirely.  Resized pixels
        # are rounded to uint8 so the stem sees the same quantization the
        # host-resize path produces (cv2's fixed-point bilinear may differ
        # by 1 LSB on a few pixels).
        # ``device_outputs=True`` colorizes/overlays on device and fetches
        # full RGB frames — the right call when the chip is PCIe-attached
        # (D2H is ~GB/s, host CPU is spared).  The default fetches only the
        # 1-byte/px class ids and reconstructs color/overlay on the host:
        # ``palette[ids]`` is an integer gather, bit-identical to the device
        # ``jnp.take``, and the D2H volume drops 7x (112 -> 16 MB per
        # 8-frame 1024x2048 batch) — decisive over remote-dispatch links
        # (measured ~45 MB/s D2H on the tunneled dev chip, which capped the
        # end-to-end video rate at <2 fps with device outputs).
        stem_fn = None
        stem_stages = 1
        if fold_batchnorm:
            from tpuseg.ops.fold_bn import fold_bn

            params = fold_bn(params, bn_state, spec)
            bn_state = {}
            if spec.variant == "D":
                from tpuseg.ops.polyphase import (
                    FusedStage3Frontend,
                    PolyphaseFrontend,
                )

                stem_dtype = (compute_dtype if compute_dtype is not None
                              else jnp.float32)
                # the frontend owns normalization (runs after the fast
                # space-to-depth) and, for 2-block stage-3 archs, the
                # stage-3 entry convs (phase-folded stride-2)
                # ``quantize_stem`` runs the three polyphase stem convs in
                # int8 too (measured 1.12x on the frontend, which is ~25%
                # of the frame once sparse/int8 serving shrinks the
                # backbone — bench_sparse --frontend).  Stage-3 convs stay
                # bf16 (measured: no further gain at their 64-wide shapes).
                try:
                    stem_fn = FusedStage3Frontend(
                        params, dtype=stem_dtype, normalize=(mean, std),
                        int8_stem=quantize_stem)
                    stem_stages = 4
                except (AssertionError, KeyError):
                    stem_fn = PolyphaseFrontend(
                        params, dtype=stem_dtype, normalize=(mean, std),
                        int8_stem=quantize_stem)
                    stem_stages = 3
        user_plans = dict(exec_plans) if exec_plans else None
        exec_plans = user_plans
        if quantize:
            from tpuseg.ops.quant import build_quant_plans, calibrate_scales

            exec_plans = build_quant_plans(params, spec)
            scales = None
            if calib_frames is not None and len(calib_frames) and exec_plans:
                arr = np.stack([np.asarray(f) for f in calib_frames])
                if (arr.ndim == 4 and target_size is not None
                        and arr.shape[1:3] != tuple(target_size)):
                    # device-resize serving: calibrate on the SAME resize
                    # the program applies (jax.image.resize bilinear, no
                    # antialias, round+clip) — not a host cv2 resize whose
                    # slightly different pixels would mis-set static scales
                    th, tw = target_size
                    r = jax.image.resize(
                        jnp.asarray(arr, jnp.float32),
                        (arr.shape[0], th, tw, 3),
                        method="bilinear", antialias=False,
                    )
                    arr = np.asarray(
                        jnp.clip(jnp.round(r), 0, 255).astype(jnp.uint8))
                # the polyphase stem needs dims divisible by 8 (same gate
                # the serving program applies); otherwise calibrate on the
                # normalized non-stem path
                use_stem = (stem_fn is not None
                            and arr.shape[1] % 8 == 0
                            and arr.shape[2] % 8 == 0)
                if use_stem:
                    # the frontend owns normalization; feed raw flat bytes
                    cal = arr.reshape(arr.shape[0], arr.shape[1], -1)
                else:
                    cal = ((arr.astype(np.float32) / 255.0
                            - np.asarray(mean, np.float32))
                           / np.asarray(std, np.float32))
                # chunk to the serving batch size: one big batch at full
                # resolution can exceed HBM (activations scale with N)
                batches = [cal[i:i + batch] for i in range(0, len(cal), batch)]
                if quantize_stem and use_stem:
                    from tpuseg.ops.polyphase import calibrate_stem_scales

                    calibrate_stem_scales(stem_fn, batches)
                scales = calibrate_scales(
                    params, bn_state, spec, batches, plans=exec_plans,
                    compute_dtype=compute_dtype,
                    stem_fn=stem_fn if use_stem else None,
                    stem_stages=stem_stages if use_stem else 1)
                exec_plans = build_quant_plans(params, spec, x_scales=scales)
            if user_plans:
                # lift the user's sparse plans to int8 too (no-op for plan
                # kinds without a quantized lowering or already-quantized
                # ones), with the calibrated scales when available; user
                # plans take precedence per conv
                from tpuseg.models.sparse_exec import quantize_sparse_plans

                user_plans = quantize_sparse_plans(user_plans,
                                                   x_scales=scales)
                exec_plans = {**exec_plans, **user_plans}
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.bn_state = {k: jnp.asarray(v) for k, v in bn_state.items()}
        self.spec = spec
        self.batch = batch
        self.want_overlay = want_overlay
        self.device_outputs = device_outputs
        self.palette_np = np.asarray(palette, np.uint8)
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        palette_dev = jnp.asarray(palette)

        # ``transport="yuv420"`` ships frames as planar I420 (1.5 bytes/px
        # instead of 3 — tpuseg.video.yuv): the right call when the chip is
        # behind a slow host link (the tunneled dev chip moves ~45-65 MB/s,
        # so H2D is the real-video bottleneck; PERF_NOTES).  The device
        # program reconstructs RGB before the stem at decode resolution;
        # chroma is 2x2-subsampled, so ids can differ slightly at color
        # edges vs rgb transport (measure per video: ids agreement >99% on
        # the shapes world).  Composes with every serving mode.
        assert transport in ("rgb", "yuv420"), transport
        self.transport = transport
        # ``ids_bits=5`` packs the fetched class ids to 5 bits/px on device
        # (tpuseg.ops.idpack) — EXACT, unpacked on the host before any
        # consumer sees them.  The D2H leg of the ids-only fetch is the
        # end-to-end bottleneck on remote-attached chips (~45 MB/s on the
        # tunneled dev chip => ~23 fps at 1024x2048; PERF_NOTES), and
        # 19-class Cityscapes ids fit in 5 bits, so packing lifts the link
        # ceiling 1.6x (2x at <=16 classes with ids_bits=4).  Requires the
        # output width to be a multiple of 8 (every /8-grid serving size
        # is).  Composes with every serving mode and with yuv420 transport
        # (which shrinks the H2D leg the same way).
        if ids_bits is not None:
            assert 1 <= ids_bits <= 8, ids_bits
            # the seg head's output channels are the class count
            # (spec.num_classes is the CLASSIFIER head's, 0 for DRNSeg)
            n_cls = self.params["seg.weight"].shape[-1]
            assert n_cls <= (1 << ids_bits), (
                f"ids_bits={ids_bits} cannot hold {n_cls} classes"
            )
        self._ids_bits = ids_bits
        if ids_bits is not None and ids_bits < 8:
            from tpuseg.ops.idpack import pack_ids

            def ship(ids):
                return pack_ids(ids, ids_bits)
        else:

            def ship(ids):
                return ids
        if transport == "yuv420":
            from tpuseg.video.yuv import i420_to_rgb_flat

            def ingest(frames_u8):
                return i420_to_rgb_flat(frames_u8)
        else:

            def ingest(frames_u8):
                return frames_u8

        assert not (temporal_interval > 1 and temporal_thresh is not None), (
            "temporal_interval and temporal_thresh are mutually exclusive"
        )
        # ``temporal_warp`` upgrades temporal reuse from copy to
        # motion-compensated copy: per-block shifts estimated on pooled
        # luma (tpuseg.video.flow), ids shifted along them.  Same device
        # forwards; the extra work is one small SAD volume + the
        # roll+select warp per batch.  Valid with interval mode and with
        # budgeted batch promotion (the sequential thresh-only scan has
        # no batched warp point).  Target dims must divide the flow grid
        # (128 px at factor=8, block=16 — checked at trace time).
        assert not temporal_warp or (
            temporal_interval > 1
            or (temporal_thresh is not None and temporal_budget is not None)
        ), (
            "temporal_warp requires interval mode (temporal_interval > 1) "
            "or budgeted adaptive mode (temporal_thresh + temporal_budget)"
        )
        assert temporal_budget is None or temporal_thresh is not None, (
            "temporal_budget requires temporal_thresh"
        )
        assert not temporal_nearest or (
            temporal_interval > 1
            or (temporal_thresh is not None and temporal_budget is not None)
        ), (
            "temporal_nearest requires a BATCHED reuse mode "
            "(temporal_interval > 1, or temporal_thresh + temporal_budget); "
            "the sequential adaptive scan cannot look ahead"
        )

        def resize_frames(frames_u8):
            # frames_u8 is (B, H, W, 3) or FLAT (B, H, W*3) — the same bytes,
            # but the flat shape gives device ops full 128-lane occupancy
            # (see tpuseg.ops.polyphase.space_to_depth_flat); the polyphase
            # frontends accept either.
            flat = frames_u8.ndim == 3
            h = frames_u8.shape[1]
            w = frames_u8.shape[2] // 3 if flat else frames_u8.shape[2]
            if target_size is not None and (h, w) != tuple(target_size):
                th, tw = target_size
                if flat:
                    frames_u8 = frames_u8.reshape(frames_u8.shape[0], h, w, 3)
                x = jax.image.resize(
                    frames_u8.astype(jnp.float32),
                    (frames_u8.shape[0], th, tw, 3),
                    method="bilinear",
                    antialias=False,  # cv2.INTER_LINEAR does not antialias
                )
                frames_u8 = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
                frames_u8 = frames_u8.reshape(frames_u8.shape[0], th, tw * 3)
                flat, h, w = True, th, tw
            return frames_u8, flat, h, w

        def ids_for(params, bn_state, frames_fwd, flat, h, w):
            """stem/normalize -> DRNSeg -> fused upsample+argmax -> cropped
            uint8 class ids (B, h, w).

            ``params``/``bn_state`` are the PROGRAM's traced arguments —
            weights must flow through the jit signature (where mesh mode's
            in_shardings govern them and a ``self.params`` swap takes
            effect), never be captured as trace-time constants."""
            use_stem = stem_fn is not None and h % 8 == 0 and w % 8 == 0
            if use_stem:
                # the frontend normalizes after its fast space-to-depth;
                # feed raw uint8 frames
                x = frames_fwd
            else:
                if flat:
                    frames_fwd = frames_fwd.reshape(
                        frames_fwd.shape[0], h, w, 3
                    )
                x = frames_fwd.astype(jnp.float32) / 255.0
                x = (x - mean) / std
            sf = stem_fn if use_stem else None
            ss = stem_stages if use_stem else 1
            if fused_upsample:
                # logits at stride 8; fused upsample+argmax avoids writing the
                # full-res 19-channel tensor to HBM
                from tpuseg.ops.upsample import upsample_argmax

                _, seg, _ = drnseg_forward(
                    params, bn_state, x, spec,
                    train=False, compute_dtype=compute_dtype, upsample=False,
                    stem_fn=sf, stem_stages=ss, sparse_plans=exec_plans,
                )
                ids = upsample_argmax(seg, params["up.weight"])
            else:
                logp, _, _ = drnseg_forward(
                    params, bn_state, x, spec,
                    train=False, compute_dtype=compute_dtype,
                    stem_fn=sf, stem_stages=ss, sparse_plans=exec_plans,
                )
                ids = jnp.argmax(logp, axis=-1)
            # inputs not divisible by 8 round the feature grid up, so the
            # upsampled map can overshoot the frame by a few pixels — crop
            return ids[:, :h, :w].astype(jnp.uint8)

        def outputs(ids, frames_u8, flat, h, w):
            if not device_outputs:
                p = ship(ids)
                return p, p, p
            color = jnp.take(palette_dev, ids, axis=0)
            if want_overlay:
                if flat:
                    frames_u8 = frames_u8.reshape(
                        frames_u8.shape[0], h, w, 3
                    )
                overlay = (frames_u8 // 2 + color // 2).astype(jnp.uint8)
                return ids, color, overlay
            return ids, color, color

        def program(params, bn_state, frames_u8):
            frames_u8 = ingest(frames_u8)
            raw_frames = frames_u8  # pre-resize (decode-res) pixels
            n_frames = frames_u8.shape[0]
            # temporal reuse: forward only the keyframes (every Nth frame);
            # ids for the rest are filled from their keyframe below
            if temporal_interval > 1 and not device_outputs:
                # ids-only serving never consumes the non-key frames'
                # pixels (the nearest/warp passes read raw_frames at
                # decode resolution), so resize ONLY the keyframes —
                # the same select-then-resize program_budget measures
                # (310 -> 387 fps at 1024x2048); the old path resized
                # N x the pixels it forwarded
                frames_fwd, flat, h, w = resize_frames(
                    frames_u8[::temporal_interval]
                )
            else:
                frames_u8, flat, h, w = resize_frames(frames_u8)
                frames_fwd = (frames_u8[::temporal_interval]
                              if temporal_interval > 1 else frames_u8)
            ids = ids_for(params, bn_state, frames_fwd, flat, h, w)
            if temporal_interval > 1:
                if temporal_nearest:
                    # bidirectional reuse: frame i gathers ids from the
                    # keyframe (behind or ahead) with the smaller
                    # accumulated-|delta| path.  Same forwards — only the
                    # gather's index map changes — but the max reuse
                    # distance halves (N-1 -> ~N/2) on steady motion,
                    # while at a scene cut the post-cut spike in the
                    # forward path keeps pre-cut frames on the pre-cut
                    # keyframe.  Deltas read the raw (decode-res) frames:
                    # one u8 diff pass, bandwidth-trivial next to the B/N
                    # forwards.  Ties stay causal (strict <).
                    n_keys = ids.shape[0]
                    d = jnp.mean(
                        jnp.abs(
                            raw_frames[1:].astype(jnp.int16)
                            - raw_frames[:-1].astype(jnp.int16)
                        ).astype(jnp.float32),
                        axis=tuple(range(1, raw_frames.ndim)),
                    )
                    cum = jnp.concatenate(
                        [jnp.zeros((1,), jnp.float32), jnp.cumsum(d)]
                    )
                    prev_k = np.arange(n_frames) // temporal_interval
                    next_k = np.minimum(prev_k + 1, n_keys - 1)
                    drift_prev = cum - cum[prev_k * temporal_interval]
                    drift_next = (
                        cum[np.minimum(next_k * temporal_interval,
                                       n_frames - 1)] - cum
                    )
                    key_of = jnp.where(
                        jnp.logical_and(next_k > prev_k,
                                        drift_next < drift_prev),
                        next_k, prev_k,
                    )
                    ids = ids[key_of]
                else:
                    # each non-key frame reuses its PRECEDING keyframe's ids
                    ids = jnp.repeat(
                        ids, temporal_interval, axis=0
                    )[:n_frames]
                if temporal_warp:
                    # motion-compensated reuse: estimate per-block shifts
                    # keyframe -> frame on pooled luma and shift the ids
                    # along them (tpuseg.video.flow) — recovers agreement
                    # lost where the scene moved, at VPU-trivial cost.
                    # Luma pools at DECODE resolution (the small maps
                    # resize to the target /8 grid), so ids-only serving
                    # never materializes resized non-key frames; keyframe
                    # maps are pooled once and repeated
                    from tpuseg.video.flow import (
                        estimate_block_shifts,
                        pooled_luma,
                        warp_ids,
                    )

                    cs = pooled_luma(raw_frames, grid=(h // 8, w // 8))
                    if temporal_nearest:
                        # shift estimation must pair each frame with the
                        # SAME keyframe its ids came from
                        ks = cs[::temporal_interval][key_of]
                    else:
                        ks = jnp.repeat(
                            cs[::temporal_interval], temporal_interval,
                            axis=0,
                        )[:n_frames]
                    dy, dx = estimate_block_shifts(ks, cs)
                    ids = warp_ids(ids, dy, dx, scale=8, block=16)
            return outputs(ids, frames_u8, flat, h, w)

        def program_adaptive(params, bn_state, frames_u8, key_frame,
                             key_ids, n_keyed):
            """Change-gated scan over the batch.  Carry: the last keyframe's
            (post-resize) pixels + its ids + a promoted-count that doubles
            as the is-initialized flag (0 forces promotion of the first
            frame ever, whatever its content)."""
            frames_u8, flat, h, w = resize_frames(ingest(frames_u8))

            def step(carry, frame):
                kf, kids, n = carry
                # full-res mean |delta| vs the KEYFRAME (not the previous
                # frame: slow drift must eventually trip the threshold).
                # u8 -> i16 subtract + reduce is bandwidth-trivial next to
                # a forward (~12 MB of traffic at 1024x2048).
                diff = jnp.mean(
                    jnp.abs(
                        frame.astype(jnp.int16) - kf.astype(jnp.int16)
                    ).astype(jnp.float32)
                )
                run = jnp.logical_or(n == 0, diff > temporal_thresh)
                ids = jax.lax.cond(
                    run,
                    lambda f: ids_for(params, bn_state, f[None],
                                      flat, h, w)[0],
                    lambda f: kids,
                    frame,
                )
                kf = jnp.where(run, frame, kf)
                return (kf, ids, n + run.astype(n.dtype)), (ids, run)

            (key_frame, key_ids, n_keyed), (ids, promoted) = jax.lax.scan(
                step, (key_frame, key_ids, n_keyed), frames_u8
            )
            return (outputs(ids, frames_u8, flat, h, w), promoted,
                    (key_frame, key_ids, n_keyed))

        def program_budget(params, bn_state, frames_u8, prev_frame,
                           key_ids, acc0, n_keyed, key_luma=None):
            """Budgeted batch promotion: vectorized change detection +
            scalar selection scan + ONE batched K-frame forward.

            The sequential variant's per-frame diff-vs-keyframe inside the
            scan costs ~1 ms/frame of pixel traffic (measured: it erased
            the batching win).  Here the pixel work is ONE parallel op —
            consecutive-frame deltas d[i] = mean|f[i] - f[i-1]| over the
            whole batch — and the sequential part scans only SCALARS:
            accumulated drift since the last keyframe (triangle-inequality
            upper bound on the true diff-to-keyframe; resets on
            promotion).  Thresholds are in accumulated-delta units: a
            static scene accumulates ~0 and never promotes; steady motion
            at per-frame delta d promotes every ~thresh/d frames; a cut
            promotes immediately.

            All pixel work stays at DECODE resolution until after
            selection: deltas read the raw frames (9x less traffic than
            post-resize at 640x360 -> 1024x2048), and only the K gathered
            promotion frames are resized and forwarded — the other B-K
            frames' pixels are never touched in ids-only serving
            (measured on v5e at 1024x2048 batch 32 K=8: 310 -> 387 fps
            device rate).  device_outputs mode still resizes every frame
            (the overlay consumes them)."""
            frames_u8 = ingest(frames_u8)
            nb = frames_u8.shape[0]
            K = temporal_budget
            prevs = jnp.concatenate(
                [prev_frame[None], frames_u8[:-1]], axis=0
            )
            d = jnp.mean(
                jnp.abs(
                    frames_u8.astype(jnp.int16) - prevs.astype(jnp.int16)
                ).astype(jnp.float32),
                axis=tuple(range(1, frames_u8.ndim)),
            )

            def sel(carry, di):
                acc, used, n = carry
                acc = acc + di
                want = jnp.logical_or(n == 0, acc > temporal_thresh)
                run = jnp.logical_and(want, used < K)
                acc = jnp.where(run, 0.0, acc)
                one = run.astype(jnp.int32)
                return (acc, used + one, n + one), run

            acc_in = acc0  # drift live-keyframe -> carry point (pre-scan)
            (acc0, _, n_keyed), flags = jax.lax.scan(
                sel, (acc0, jnp.zeros((), jnp.int32), n_keyed), d
            )
            cs = jnp.cumsum(flags.astype(jnp.int32))
            # frame i's keyframe sits at promoted-order slot cs[i]-1
            # (-1: no promotion yet this batch -> the carried key_ids)
            keyslot = cs - 1
            # slot s <- index of the (s+1)-th promoted frame; unpromoted
            # flags scatter into a dump slot; unfilled slots forward frame
            # 0 (static padding — the budget is paid regardless)
            slot_of = jnp.where(flags, keyslot, K)
            fwd_idx = (
                jnp.zeros((K + 1,), jnp.int32)
                .at[slot_of].set(jnp.arange(nb, dtype=jnp.int32))[:K]
            )
            sel_frames, flat, h, w = resize_frames(frames_u8[fwd_idx])
            ids_k = ids_for(params, bn_state, sel_frames, flat, h, w)
            total = cs[-1]  # promotions made this batch
            if temporal_nearest:
                # bidirectional reuse: each frame gathers ids from the
                # promoted frame with the smaller accumulated-|delta| PATH
                # (drift), behind OR ahead in the batch — all K keyframes
                # come out of the one batched forward, so looking ahead is
                # free.  Drift, not frame distance: at a scene cut the
                # path to the post-cut keyframe contains the cut's spike,
                # so pre-cut frames keep the pre-cut keyframe (frame-
                # distance nearest would copy wrong-scene ids backward).
                # The carried ``acc0`` is the drift from the live keyframe
                # to the carry point, so the backward path is exact across
                # batch boundaries; ties stay causal (strict <).
                cum = jnp.cumsum(d)
                next_slot = keyslot + 1
                pos_prev = fwd_idx[jnp.clip(keyslot, 0, K - 1)]
                pos_next = fwd_idx[jnp.clip(next_slot, 0, K - 1)]
                drift_prev = jnp.where(
                    keyslot >= 0, cum - cum[pos_prev], acc_in + cum
                )
                drift_next = cum[pos_next] - cum
                use_next = jnp.logical_and(
                    next_slot < total, drift_next < drift_prev
                )
                slot_eff = jnp.where(use_next, next_slot, keyslot)
            else:
                slot_eff = keyslot
            ids = jnp.where(
                (slot_eff >= 0)[:, None, None],
                ids_k[jnp.clip(slot_eff, 0, K - 1)],
                key_ids[None],
            )
            # every frame carries its keyframe's ids, so the last frame's
            # ids ARE the live keyframe's ids; the drift accumulator and
            # the last (raw) frame (for the next batch's d[0]) carry over.
            # The carry snapshots the RAW keyframe ids BEFORE warping —
            # the warp is an output transform, not part of the key state
            key_ids = ids[-1]
            carry = [frames_u8[-1], key_ids, acc0, n_keyed]
            if temporal_warp:
                # motion-compensate the reused ids.  The decode->target
                # scale is generally non-integer, so motion is estimated
                # on luma pooled at DECODE resolution and the tiny pooled
                # maps are resized to the target /8 grid — both keyframe
                # and current luma go through the same path, so the SAD
                # stays apples-to-apples and shift units are target-grid
                # blocks natively.  Costs one pooled pass over the raw
                # batch + the SAD/select chain (~4 ms/batch at 1024x2048
                # batch 32); the forwards are untouched
                from tpuseg.video.flow import (
                    estimate_block_shifts,
                    pooled_luma,
                    warp_ids as flow_warp_ids,
                )

                th, tw = ids.shape[1], ids.shape[2]
                small = pooled_luma(frames_u8, grid=(th // 8, tw // 8))
                key_small = jnp.where(
                    (slot_eff >= 0)[:, None, None],
                    small[fwd_idx][jnp.clip(slot_eff, 0, K - 1)],
                    key_luma[None],
                )
                dy, dx = estimate_block_shifts(key_small, small)
                ids = flow_warp_ids(ids, dy, dx, scale=8, block=16)
                carry.append(key_small[-1])  # live keyframe's luma
            if device_outputs:
                frames_t, flat_t, _, _ = resize_frames(frames_u8)
                out = outputs(ids, frames_t, flat_t, h, w)
            else:
                p = ship(ids)
                out = (p, p, p)
            return (out, flags, tuple(carry))

        self.temporal_thresh = temporal_thresh
        self.temporal_budget = temporal_budget
        self._temporal_warp = temporal_warp
        self.target_size = target_size
        self._carry = None  # adaptive mode: persists across run() batches
        self._frames_sharding = None
        if mesh is not None:
            # multi-chip serving: batch-dim data parallelism over a
            # Mesh('data').  Params replicate, frames shard; the whole
            # program partitions under GSPMD (the serving counterpart of
            # the trainers' shard_train_step; the reference's only serving
            # parallelism is torch DataParallel, semantic_seg.py:809-815).
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(np.prod(list(mesh.shape.values())))
            assert temporal_thresh is None, (
                "adaptive temporal reuse is sequential frame-to-frame; "
                "use interval mode or a single device"
            )
            # compression composes with the mesh when every plan lowers to
            # pure XLA (gathered/grouped convs, RBGP, int8 QuantConv):
            # GSPMD partitions those like any conv.  Pallas-backed plans
            # (FusedSparseConv(Q), CompactSparse(Q)) are opaque custom
            # calls the partitioner cannot split — reject only those.
            unsafe = [k for k, p in (exec_plans or {}).items()
                      if not _plan_gspmd_safe(p)]
            if unsafe:
                raise ValueError(
                    "Pallas-backed exec plans are opaque to the GSPMD "
                    f"partitioner: {sorted(unsafe)}; use the gathered "
                    "lowering (--sparse-lowering gathered, the CLI "
                    "default) or serve single-device"
                )
            assert batch % n_dev == 0, (
                f"batch {batch} must divide over the {n_dev}-device mesh"
            )
            repl = NamedSharding(mesh, P())
            self._frames_sharding = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, repl)
            self.bn_state = jax.device_put(self.bn_state, repl)
            self._program = jax.jit(
                program,
                in_shardings=(repl, repl, self._frames_sharding),
            )
        else:
            if temporal_thresh is not None and temporal_budget is not None:
                assert 0 < temporal_budget <= batch, (
                    f"temporal_budget {temporal_budget} must be in "
                    f"1..batch ({batch})"
                )
                adaptive_prog = program_budget
            else:
                assert temporal_budget is None, (
                    "temporal_budget requires temporal_thresh"
                )
                adaptive_prog = program_adaptive
            self._program = jax.jit(
                adaptive_prog if temporal_thresh is not None else program
            )

    def _make_carry(self, h: int, w: int):
        """Fresh adaptive-mode carry for incoming frames of DECODE shape
        (h, w); n_keyed=0 forces the first frame ever to promote
        regardless of content.

        Sequential mode carries (keyframe pixels, keyframe ids, n_keyed),
        both at the POST-resize shape (its scan diffs resized frames).
        Budget mode carries (previous frame pixels at DECODE shape — the
        consecutive deltas read raw frames —, live keyframe ids at the
        post-resize shape, accumulated drift, n_keyed[, live keyframe's
        pooled luma at the target /8 grid when warping])."""
        th, tw = (self.target_size if self.target_size is not None
                  else (h, w))
        ids = jnp.zeros((th, tw), jnp.uint8)
        n = jnp.zeros((), jnp.int32)
        if self.temporal_budget is not None:
            carry = (jnp.zeros((h, w * 3), jnp.uint8), ids,
                     jnp.zeros((), jnp.float32), n)
            if self._temporal_warp:
                carry += (jnp.zeros((th // 8, tw // 8), jnp.float32),)
            return carry
        return (jnp.zeros((th, tw * 3), jnp.uint8), ids, n)

    def run(
        self,
        frames,
        *,
        max_frames: int | None = None,
        warmup: bool = True,
        need_color: bool = True,
    ) -> dict:
        """Stream frames through the device program.

        Host decode and device compute are pipelined one batch deep: a batch
        is dispatched asynchronously and its results are fetched only when
        the next batch has been decoded and dispatched — the device works
        while cv2 decodes (the reference loop serialized these,
        SURVEY.md §3.3).

        Returns dict with ids, colorized frames, per-batch times and fps.
        ``fps`` is end-to-end wall-clock throughput of the pipelined loop
        (decode + compute overlapped); ``batch_times`` intervals overlap
        under pipelining and are diagnostic only.  For pure device rate use
        ``benchmark_device_fps``."""
        it = iter(frames)
        ids_out, color_out = [], []
        batch_times = []
        fps_meter = FpsMeter()
        n_done = 0
        pending = []
        first = True
        t_wall0 = None

        adaptive = self.temporal_thresh is not None
        promoted_flags = []  # per-frame, truncated with ids below

        def init_carry(arr):
            # arr is the SHIPPED array: RGB (B,H,W,3), flat (B,H,W*3), or
            # planar I420 (B,H*3/2,W); the carry lives in decode-res RGB
            if self.transport == "yuv420":
                from tpuseg.video.yuv import i420_geometry

                return self._make_carry(i420_geometry(arr.shape[1]),
                                        arr.shape[2])
            h = arr.shape[1]
            w = arr.shape[2] // 3 if arr.ndim == 3 else arr.shape[2]
            return self._make_carry(h, w)

        def call_program(arr):
            if not adaptive:
                if self._frames_sharding is not None:
                    # multi-chip: scatter the host batch straight to its
                    # per-device shards (no single-device staging copy)
                    x = jax.device_put(np.asarray(arr), self._frames_sharding)
                else:
                    x = jnp.asarray(arr)
                return self._program(self.params, self.bn_state, x), None
            if self._carry is None:
                self._carry = init_carry(arr)
            results, promoted, carry = self._program(
                self.params, self.bn_state, jnp.asarray(arr), *self._carry
            )
            self._carry = carry
            return results, promoted

        def submit(buf):
            nonlocal first, t_wall0
            arr = np.stack(buf)
            pad = 0
            if arr.shape[0] < self.batch:
                pad = self.batch - arr.shape[0]
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            frames_host = arr
            if self.transport == "yuv420":
                # ship planar I420: 1.5 bytes/px over the link; the device
                # program reconstructs RGB (tpuseg.video.yuv).  A 3-D stack
                # means the SOURCE already delivered packed planes
                # (NativeFrameSource fmt="i420") — nothing to convert
                if arr.ndim == 4:
                    from tpuseg.video.yuv import rgb_to_i420

                    arr = rgb_to_i420(arr)
            elif adaptive or not (self.want_overlay and self.device_outputs):
                # upload flat (B, H, W*3): same bytes (numpy view), full
                # lane occupancy on device.  Device-side overlay blending
                # keeps 4-D frames (the blend consumes them in image shape);
                # adaptive mode is always flat (the keyframe carry is flat)
                arr = arr.reshape(arr.shape[0], arr.shape[1], -1)
            if first and warmup:
                # compile excluded from timing; the warmup run advances the
                # adaptive keyframe carry, so snapshot and restore it
                carry0 = self._carry
                r, _ = call_program(arr)
                np.asarray(r[0])
                self._carry = carry0
                first = False
            t0 = time.perf_counter()
            if t_wall0 is None:
                t_wall0 = t0
            results, promoted = call_program(arr)
            # start the device->host copies NOW so they overlap the next
            # batch's upload/compute (measured 19 -> 24 fps end-to-end on
            # the tunneled dev chip at depth 2)
            try:
                results[0].copy_to_host_async()
                if need_color and self.device_outputs:
                    (results[2] if self.want_overlay
                     else results[1]).copy_to_host_async()
            except AttributeError:
                pass  # older jax Array without async host copies
            return results, arr.shape[0] - pad, t0, frames_host, promoted

        def collect(flight):
            (ids, color, overlay), n, t0, frames_host, promoted = flight
            if promoted is not None:
                promoted_flags.append(np.asarray(promoted)[:n])
            ids = np.asarray(ids)  # forces completion (device->host)
            if self._ids_bits is not None and not self.device_outputs:
                from tpuseg.ops.idpack import unpack_ids

                ids = unpack_ids(ids, self._ids_bits)
            if not need_color:
                color = None
            elif self.device_outputs:
                color = np.asarray(overlay if self.want_overlay else color)
            else:
                # host reconstruction from ids: bit-identical to the device
                # palette gather / overlay blend (integer ops both sides)
                color = self.palette_np[ids]
                if self.want_overlay:
                    if frames_host.ndim == 3:
                        # planar-I420 source: reconstruct RGB for the blend
                        from tpuseg.video.yuv import (i420_geometry,
                                                      i420_to_rgb_flat)

                        h_dec = i420_geometry(frames_host.shape[1])
                        frames_host = np.asarray(
                            i420_to_rgb_flat(frames_host)
                        ).reshape(frames_host.shape[0], h_dec, -1, 3)
                    imgs = frames_host.reshape(frames_host.shape[:3] + (3,))
                    if imgs.shape[1:3] != ids.shape[1:3]:
                        # device-resize mode: frames were shipped at decode
                        # resolution; upscale host-side for the blend
                        from PIL import Image

                        th, tw = ids.shape[1:3]
                        imgs = np.stack([
                            np.asarray(Image.fromarray(f).resize(
                                (tw, th), Image.BILINEAR))
                            for f in imgs
                        ])
                    color = (imgs // 2 + color // 2).astype(np.uint8)
            dt = time.perf_counter() - t0
            batch_times.append((dt, n))
            ids_out.append(ids[:n])
            if color is not None:
                color_out.append(color[:n])
            fps_meter.tick()
            return n

        DEPTH = 2  # batches in flight; depth 2 overlaps D2H with compute
        flights = []

        def n_flight():
            return sum(f[1] for f in flights)

        for frame in it:
            pending.append(frame)
            if len(pending) == self.batch:
                flights.append(submit(pending))
                pending = []
                if len(flights) > DEPTH:
                    n_done += collect(flights.pop(0))
            if max_frames is not None and n_done + n_flight() >= max_frames:
                break
        if pending and (
            max_frames is None or n_done + n_flight() < max_frames
        ):
            flights.append(submit(pending))
        while flights:
            n_done += collect(flights.pop(0))

        # wall clock from first submit to last collect: with one-deep
        # pipelining the per-batch intervals overlap, so summing them would
        # under-report fps by up to 2x
        total_t = (time.perf_counter() - t_wall0) if t_wall0 is not None else 0.0
        total_n = sum(n for _, n in batch_times)
        ids_all = np.concatenate(ids_out) if ids_out else np.zeros((0,))
        color_all = np.concatenate(color_out) if color_out else np.zeros((0,))
        if max_frames is not None and len(ids_all) > max_frames:
            # the last flush can overshoot the request; return exactly
            # max_frames (the reference demos process exactly 25 frames)
            ids_all = ids_all[:max_frames]
            color_all = color_all[:max_frames]
            total_n = max_frames
        out = {
            "ids": ids_all,
            "color": color_all,
            "frames": total_n,
            "seconds": total_t,
            "fps": total_n / total_t if total_t > 0 else 0.0,
            "batch_times": batch_times,
        }
        if adaptive:
            # count promotions over exactly the RETURNED frames: a
            # max_frames break can leave already-collected flights beyond
            # the cut, and counting their promotions against a clamped
            # denominator would overstate the rate (even past 1.0)
            flags = (np.concatenate(promoted_flags)[:total_n]
                     if promoted_flags else np.zeros((0,), bool))
            out["promoted"] = int(flags.sum())
            out["promotion_rate"] = (
                out["promoted"] / total_n if total_n else 0.0
            )
        return out

    def benchmark_device_fps(
        self, size: tuple[int, int], inner: int = 32, reps: int = 3
    ) -> float:
        """Pure device throughput (frames/sec) at (H, W): on-device scan
        with loop-carried dependencies, immune to per-dispatch overhead and
        XLA hoisting (the bench.py methodology as a library API)."""
        import jax

        assert self.temporal_thresh is None, (
            "adaptive mode's device rate is content-dependent; use "
            "benchmark_adaptive_device_fps with real frames"
        )
        h, w = size

        @jax.jit
        def loop(frames):
            def body(fc, _):
                ids, _, _ = self._program(self.params, self.bn_state, fc)
                # single-byte data-dependent feedback: keeps XLA from
                # hoisting the forward without taxing the measurement with
                # a full-tensor carry update (bench.py methodology)
                probe = ids[0, 0, 0].astype(fc.dtype)
                fc = jax.lax.dynamic_update_slice(
                    fc, probe.reshape((1,) * fc.ndim), (0,) * fc.ndim
                )
                return fc, probe

            _, probes = jax.lax.scan(body, frames, None, length=inner)
            return probes.astype(jnp.int32).sum()

        if self.transport == "yuv420":
            frames = jnp.zeros((self.batch, h * 3 // 2, w), jnp.uint8)
        else:
            frames = jnp.zeros((self.batch, h, w * 3), jnp.uint8)
        if self._frames_sharding is not None:
            frames = jax.device_put(frames, self._frames_sharding)
        float(np.asarray(loop(frames)))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(frames)))
            best = min(best, (time.perf_counter() - t0) / inner)
        return self.batch / best

    def benchmark_adaptive_device_fps(
        self, frames, reps: int = 3
    ) -> dict:
        """Device rate of the ADAPTIVE temporal program on real frames.

        Adaptive throughput is content-dependent (static stretches cost ~0,
        promotions cost a full forward), so it must be measured on the
        actual video: the frames are stacked into on-device batches and a
        single jitted scan threads the keyframe carry through all of them —
        the batch-to-batch carry dependency keeps XLA from hoisting or
        overlapping iterations dishonestly.  Returns device fps and the
        promotion rate on these frames."""
        import jax

        assert self.temporal_thresh is not None, "adaptive mode only"
        arr = np.stack([np.asarray(f) for f in frames])
        b = self.batch
        # Measure over FULL batches of REAL frames only: padding with
        # repeats of the last frame biases the measurement (zero-diff pads
        # take the near-free reuse path, inflating plain-adaptive fps and
        # diluting every mode's promotion rate).  run() pads and trims for
        # serving; a benchmark drops the remainder instead.
        assert len(arr) >= b, (
            f"need at least one full batch ({b}) of real frames, got "
            f"{len(arr)}"
        )
        dropped = len(arr) % b
        if dropped:
            arr = arr[: len(arr) - dropped]
        if self.transport == "yuv420":
            if arr.ndim == 4:
                from tpuseg.video.yuv import rgb_to_i420

                arr = rgb_to_i420(arr)
            from tpuseg.video.yuv import i420_geometry

            carry0 = self._make_carry(i420_geometry(arr.shape[1]),
                                      arr.shape[2])
        else:
            carry0 = self._make_carry(arr.shape[1], arr.shape[2])
        xs = arr.reshape(len(arr) // b, b, arr.shape[1], -1)  # flat frames

        @jax.jit
        def loop(xs):
            def body(carry, fb):
                (ids, _, _), promoted, carry = self._program(
                    self.params, self.bn_state, fb, *carry
                )
                return carry, (ids[0, 0, 0], promoted.sum())

            carry, (probes, promos) = jax.lax.scan(body, carry0, xs)
            return probes.astype(jnp.int32).sum(), promos.sum()

        xs = jnp.asarray(xs)
        probe, promos = loop(xs)  # compile + warmup
        n_promoted = int(np.asarray(promos))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(xs)[0]))
            best = min(best, time.perf_counter() - t0)
        n = xs.shape[0] * b
        return {
            "device_fps": n / best,
            "promotion_rate": n_promoted / n,
            "frames": n,
            "frames_dropped": dropped,
        }
