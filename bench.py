#!/usr/bin/env python
"""Headline benchmark: DRN-D-22 video segmentation throughput at 1024x2048
on one TPU chip (the reference's north-star workload, seg_video*).

Prints one JSON line per compression-stack mode (``"event": "bench_mode"``,
measured via VideoSegmenter.benchmark_device_fps — the serving CLI's own
program — with ratios against the same-session dense sibling), then the
FINAL line the driver parses:

  {"metric": "seg_video_fps_1024x2048", "value": N, "unit": "fps",
   "vs_baseline": N / 60.0, "modes": [...]}

``value`` is the dense-exact headline (comparable to every prior round's
record); ``modes`` embeds the whole stack — dense exact, block-sparse
(block128reg 87.5%, gathered exact lowering), int8+stem PTQ, sparse+int8,
and sparse+int8+budgeted-temporal — so the driver-captured BENCH record
witnesses the differentiators, not just the dense floor (round-4 verdict
task 2).  Baseline: 60 fps at 1024x2048 (BASELINE.md target for one v5e
chip).  Set TPUSEG_BENCH_MODES=dense to skip the mode sweep.

Method: the full per-frame program (normalize -> DRNSeg forward (bf16) ->
fused upsample+argmax -> uint8 ids) runs as one jitted device program over a
batch of frames, looped on device via lax.scan to amortize dispatch (remote
dispatch costs ~50 ms/call on the axon relay).  Timing forces completion by
fetching a reduction of the result (block_until_ready does not block over
the relay).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Bounded retry on relay/backend outages (round-3 verdict: a single
# transient "Unable to initialize backend 'axon': UNAVAILABLE" zeroed out
# the round's official perf record).  jax caches a failed backend init for
# the process lifetime, so each attempt is a fresh subprocess.  The result
# is only ever a real measurement — on final failure we exit nonzero.
RETRY_BACKOFFS_S = (60, 120, 240, 300, 300)

# monotonic start of THIS process: the inner attempt measures its own
# elapsed time against the wrapper's 2400s subprocess timeout
_T_START = time.monotonic()


def main_with_retries():
    env = dict(os.environ, TPUSEG_BENCH_INNER="1")
    for i, backoff in enumerate((0,) + RETRY_BACKOFFS_S):
        if backoff:
            print(f"bench: backend unavailable, retry {i}/"
                  f"{len(RETRY_BACKOFFS_S)} in {backoff}s", file=sys.stderr)
            time.sleep(backoff)
        try:
            # 40 min/attempt: remote compile is 1-3 min and the relay's
            # first op can take up to ~17 min when it flaps (verify skill)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            err = "attempt timed out after 2400s (relay hang)"
            print(f"bench: {err}", file=sys.stderr)
            continue
        for line in reversed(proc.stdout.splitlines()):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in row:
                print(line)
                return 0
        err = proc.stderr[-4000:]
        if "UNAVAILABLE" not in err and "DEADLINE_EXCEEDED" not in err:
            sys.stderr.write(err)
            return proc.returncode or 1
    sys.stderr.write(err)
    print("bench: backend unavailable after all retries", file=sys.stderr)
    return 1


def run_modes(BATCH, H, W, deadline_s=None):
    """Device rate of every headline compression mode, same session, via
    the serving pipeline's own scan harness (benchmark_device_fps).  Each
    mode is isolated: a failure records an error row and the sweep (and
    the already-printed dense headline) survives.  ``deadline_s`` is a
    monotonic-clock deadline: modes that would start past it are recorded
    skipped so the retry wrapper's 2400s attempt timeout can never eat
    the whole record."""
    import jax.numpy as jnp

    from tpuseg.data.shapes import shapes_video
    from tpuseg.models import init_drnseg
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.sparsity import apply_masks, create_masker
    from tpuseg.video import VideoSegmenter

    MEAN, STD = [0.290, 0.328, 0.287], [0.183, 0.187, 0.184]
    cfg = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "optimal_configs", "drn_d_22", "drn_d_22_block128reg_87.50.json",
    )
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    masker = create_masker(cfg, seed=0)
    masks = masker.generate_masks(params, is_static=True, verbose=False)
    sparams = dict(apply_masks(params, masks))
    plans, _report = build_sparse_plans(
        fold_bn(sparams, state, spec), masks, spec,
        lowering="gathered", gathered_mode="exact")  # the CLI default
    calib = list(shapes_video(8, (H, W), seed=0)[0])

    def seg(params_=None, **kw):
        return VideoSegmenter(
            params_ if params_ is not None else params, state, spec,
            MEAN, STD, compute_dtype=jnp.bfloat16, batch=BATCH, **kw,
        )

    modes = []

    def measure(name, make, adaptive_frames=None):
        if deadline_s is not None and time.monotonic() > deadline_s:
            row = {"mode": name, "skipped": "time budget"}
            modes.append(row)
            print(json.dumps({"event": "bench_mode", **row}), flush=True)
            return row
        try:
            s = make()
            if adaptive_frames is not None:
                r = s.benchmark_adaptive_device_fps(adaptive_frames)
                row = {"mode": name, "device_fps": round(r["device_fps"], 1),
                       "promotion_rate": round(r["promotion_rate"], 3)}
            else:
                row = {"mode": name,
                       "device_fps": round(s.benchmark_device_fps((H, W)), 1)}
        except Exception as e:  # noqa: BLE001 — per-mode isolation
            row = {"mode": name, "error": f"{type(e).__name__}: {e}"[:300]}
        modes.append(row)
        print(json.dumps({"event": "bench_mode", **row}), flush=True)
        return row

    dense = measure("dense_exact", seg)
    measure("sparse_block128reg_87.5",
            lambda: seg(sparams, exec_plans=plans))
    measure("int8_stem",
            lambda: seg(quantize=True, quantize_stem=True,
                        calib_frames=calib))
    measure("sparse_int8",
            lambda: seg(sparams, exec_plans=plans, quantize=True,
                        calib_frames=calib))
    # composed stack on synthetic moving content (self-contained — the
    # budgeted mode's rate is content-dependent, so it needs real frames)
    try:
        frames = list(shapes_video(2 * BATCH, (H, W), seed=1)[0])
        from tpuseg.video.autotune import drift_threshold

        thresh, _ = drift_threshold(frames)
        measure(
            f"sparse_int8_budget{max(1, BATCH // 4)}",
            lambda: seg(sparams, exec_plans=plans, quantize=True,
                        calib_frames=calib, temporal_thresh=thresh,
                        temporal_budget=max(1, BATCH // 4)),
            adaptive_frames=frames,
        )
    except Exception as e:  # noqa: BLE001
        modes.append({"mode": "sparse_int8_budget",
                      "error": f"{type(e).__name__}: {e}"[:300]})
    if "device_fps" in dense:
        for row in modes[1:]:
            if "device_fps" in row:
                row["ratio_vs_dense"] = round(
                    row["device_fps"] / dense["device_fps"], 3)
    return modes


def main():
    import jax
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.models.drnseg import drnseg_forward
    from tpuseg.ops.upsample import upsample_argmax

    H, W = 1024, 2048
    # batch=32 serving mode: the reference's own throughput probes batch
    # frames (seg_video.py:280-285 times a 26-frame batch; seg_video_new.py
    # runs 25-frame batches), and batching is how a deployed video service
    # runs.  Measured batch sweep on v5e (round 3): 1 -> 106.0, 8 -> 112.6,
    # 12 -> 87.4 (non-multiple-of-8 batch breaks the folded layouts),
    # 16 -> 114.7, 24 -> 115.9, 32 -> 116.5 fps; diminishing past 16, so 32
    # is at the plateau (275 ms/batch latency — fine for throughput
    # serving; latency-sensitive callers use batch 8 via
    # TPUSEG_BENCH_BATCH / seg_video --batch).
    BATCH = int(os.environ.get("TPUSEG_BENCH_BATCH", "32"))
    # forwards per dispatched call: the remote-dispatch overhead on the axon
    # relay is ~30 ms/call, so the device-side scan must be long enough to
    # amortize it below the noise floor (INNER scan steps x BATCH frames)
    INNER = 8
    REPS = 3

    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import FusedStage3Frontend

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    # MXU-efficient frontend: layers 0-2 (the low-channel full/half-res
    # convs) run in space-to-depth domain, 48->256->256->128 channels
    # (exact rearrangement, tests/test_polyphase.py).  Normalization runs
    # AFTER the (word-level bitcast) space-to-depth — elementwise math on
    # the 3-lane full-res tensor measured ~2 ms of pure layout waste.
    # ...and stage 3's stride-2 entry consumes the frontend's f=2 phase
    # tensor directly (the d2s/s2d round trip cancels; FusedStage3Frontend)
    stem = FusedStage3Frontend(
        folded, normalize=([0.290, 0.328, 0.287], [0.183, 0.187, 0.184])
    )
    params = jax.device_put(folded)
    state = {}

    def frame_program(frames_u8):
        _, seg, _ = drnseg_forward(
            params, state, frames_u8, spec, train=False,
            compute_dtype=jnp.bfloat16, upsample=False, stem_fn=stem,
            stem_stages=4,
        )
        ids = upsample_argmax(seg, params["up.weight"])
        return ids.astype(jnp.uint8)

    @jax.jit
    def bench_loop(frames_u8):
        # The frames are threaded through the carry and perturbed with the
        # previous result each step, so every iteration is data-dependent —
        # XLA cannot hoist the forward out of the loop (which would fake an
        # INNER-times-too-fast measurement).  The perturbation writes ONE
        # byte (dynamic_update_index): a full-tensor `frames + ids` add was
        # measured at ~0.9 ms/iter of pure harness tax on v5e (u8
        # elementwise runs far below HBM speed), which belongs to the
        # harness, not the frame program.
        def body(frames, _):
            ids = frame_program(frames)
            probe = ids[0, 0, 0].astype(frames.dtype)
            frames = jax.lax.dynamic_update_slice(
                frames, probe.reshape((1,) * frames.ndim), (0,) * frames.ndim
            )
            return frames, probe

        _, probes = jax.lax.scan(body, frames_u8, None, length=INNER)
        return probes.astype(jnp.int32).sum()

    rng = np.random.default_rng(0)
    # frames are fed FLAT (batch, H, W*3): identical bytes to HWC row-major
    # (a free numpy view for any decoder output), but the device array gets
    # full 128-lane occupancy instead of c=3 minor — see
    # tpuseg.ops.polyphase.space_to_depth_flat for the measured layout tax.
    frames = jnp.asarray(
        rng.integers(0, 256, size=(BATCH, H, W * 3), dtype=np.uint8)
    )

    # compile + warmup (forced fetch)
    _ = int(np.asarray(bench_loop(frames)))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = int(np.asarray(bench_loop(frames)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = (BATCH * INNER) / best

    modes = []
    if os.environ.get("TPUSEG_BENCH_MODES", "full") != "dense":
        # leave >=5 min of the retry wrapper's 2400s attempt budget as
        # slack: a mode that would start after the deadline is skipped,
        # not allowed to push the whole attempt into the timeout
        modes = run_modes(BATCH, H, W,
                          deadline_s=_T_START + (2400 - 420))

    print(
        json.dumps(
            {
                "metric": "seg_video_fps_1024x2048",
                "value": round(fps, 2),
                "unit": "fps",
                "batch": BATCH,
                "vs_baseline": round(fps / 60.0, 3),
                **({"modes": modes} if modes else {}),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("TPUSEG_BENCH_INNER"):
        sys.exit(main())
    sys.exit(main_with_retries())
