"""Round-5 on-chip validation of the autotune MODE CHOOSER (verdict #4).

Two synthetic contents with known drift physics (shapes world, measured
GT surface in PERF_NOTES):
- SLOW (speed 0.5 px/frame): cadence reuse is near-free -> the chooser
  must pick a NON-budgeted mode (fixed-N cadence) and the held-out
  agreement must still meet the floor.
- FAST (speed 8 px/frame): blind cadence pays; the chooser should fall
  through to a budget mode or exact.

Held-out protocol: calibrate on the first 32 frames, then serve the
NEXT 32 frames with the chosen config and report ids agreement vs the
exact run of the same held-out frames.

Run (one TPU job at a time, quiet host):
    PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r5_autotune_modes.py
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from tpuseg.data.shapes import shapes_video
    from tpuseg.models import init_drnseg
    from tpuseg.ops.quant import ids_agreement
    from tpuseg.video import VideoSegmenter
    from tpuseg.video.autotune import autotune_budget

    H, W, BATCH, CAL, HELD = 512, 1024, 8, 32, 32
    FLOOR = 0.95
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    MEAN, STD = [0.290, 0.328, 0.287], [0.183, 0.187, 0.184]

    def make_factory():
        def make(**kw):
            return VideoSegmenter(
                params, state, spec, MEAN, STD,
                compute_dtype=jnp.bfloat16, batch=BATCH, **kw,
            )
        return make

    for label, speed, seed in (("slow", 0.5, 5), ("fast", 8.0, 6)):
        frames = list(shapes_video(CAL + HELD, (H, W), seed=seed,
                                   speed=speed)[0])
        cal, held = frames[:CAL], frames[CAL:]
        t0 = time.time()
        make = make_factory()
        res = autotune_budget(make, cal, target_agreement=FLOOR,
                              batch=BATCH)
        tune_s = time.time() - t0
        exact_ids = np.stack(make().run(held, need_color=False)["ids"])
        if res["choice_kwargs"]:
            seg = make(**res["choice_kwargs"])
            ids = np.stack(seg.run(held, need_color=False)["ids"])
            held_agr = float(ids_agreement(ids, exact_ids))
        else:
            held_agr = 1.0  # exact fallback serves exactly
        print(json.dumps({
            "event": "autotune_mode_chooser", "content": label,
            "speed_px_per_frame": speed, "floor": FLOOR,
            "choice": res["choice"], "choice_kwargs": res["choice_kwargs"],
            "table": res["table"], "held_out_agreement": round(held_agr, 4),
            "tune_seconds": round(tune_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
