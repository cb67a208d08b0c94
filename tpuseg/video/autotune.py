"""Agreement-targeted autotuning for budgeted temporal serving.

The accuracy cost of temporal id-reuse is a property of the CONTENT
(drift rate x admitted staleness), not of the model — measured as a
full (speed, budget) surface in docs/PERF_NOTES.md ("Budgeted-temporal
tradeoff curve"): there is no universal refresh budget K, so every
deployment must tune per video.  This module makes the framework do
that tuning.  Given a target ids-agreement floor:

1. run the exact per-frame pipeline on a short calibration prefix,
2. run the budgeted pipeline at an ascending ladder of K values on the
   SAME frames (threshold set from the prefix's own drift scale),
3. pick the smallest K — the cheapest serving point, device compute
   scales ~K/batch — whose agreement vs exact meets the floor.

If no K on the ladder qualifies, the recommendation is exact serving
(``temporal_budget=None``): reuse simply does not fit this content at
the requested fidelity.

Each candidate K is its own compiled program (the K-frame gather shape
is static), so autotuning costs len(ladder)+1 compiles up front — a
once-per-stream cost, amortized over long-running serving.

Reference counterpart: none — the reference serves exact per-frame
(`/root/reference/seg_video.py:280-285`); this is the control loop for
tpuseg's temporal extension (CLI: `seg_video --temporal-autotune A`).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def drift_threshold(frames: Sequence[np.ndarray]) -> tuple[float, float]:
    """Drift scale of THIS content: host-side mean |delta| between
    consecutive frames (same 0..255 pixel-delta units as the device
    scan) -> (threshold between the sensor-noise floor and the motion
    signal, mean |delta|)."""
    deltas = np.stack(
        [
            np.abs(
                frames[i + 1].astype(np.int16) - frames[i].astype(np.int16)
            ).mean()
            for i in range(len(frames) - 1)
        ]
    )
    thresh = float(
        np.percentile(deltas, 25) * 0.5 + np.percentile(deltas, 75) * 0.5
    )
    return thresh, float(deltas.mean())


def default_ladder(batch: int) -> list[int]:
    """Ascending candidate budgets: ~1/8, 1/4, 1/2, 3/4 of the serve
    batch (deduped, each >= 1 and < batch)."""
    raw = (batch // 8, batch // 4, batch // 2, (3 * batch) // 4)
    return sorted({min(batch - 1, max(1, k)) for k in raw}) if batch > 1 else [1]


def autotune_budget(
    make_segmenter: Callable[..., object],
    calib_frames: Sequence[np.ndarray],
    *,
    target_agreement: float,
    batch: int,
    ks: Sequence[int] | None = None,
) -> dict:
    """Pick the cheapest budgeted-temporal config meeting an agreement floor.

    ``make_segmenter(**temporal_kwargs)`` must build a VideoSegmenter with
    every NON-temporal serving option already bound (quantization, sparse
    plans, transport, ...), so candidates are measured in exactly the
    configuration that will serve.  Called with no kwargs it must build
    the exact per-frame baseline.

    Returns a dict with ``temporal_thresh``, ``temporal_budget`` (None if
    no candidate met the floor -> serve exact), ``table`` (per-candidate
    agreement, in evaluation order), ``target_agreement``, ``drift_mean``,
    and ``calib_frames`` (prefix length used).
    """
    from tpuseg.ops.quant import ids_agreement

    frames = list(calib_frames)
    if len(frames) < max(2, batch):
        raise ValueError(
            f"autotune needs at least max(2, batch)={max(2, batch)} "
            f"calibration frames, got {len(frames)}"
        )
    thresh, drift_mean = drift_threshold(frames)
    exact_ids = np.stack(make_segmenter().run(frames, need_color=False)["ids"])
    ladder = (sorted({int(k) for k in ks}) if ks is not None
              else default_ladder(batch))
    if not all(0 < k <= batch for k in ladder):
        raise ValueError(f"budget candidates {ladder} must be in 1..{batch}")
    table = []
    choice = None
    for k in ladder:
        seg = make_segmenter(temporal_thresh=thresh, temporal_budget=k)
        ids = np.stack(seg.run(frames, need_color=False)["ids"])
        n = min(len(ids), len(exact_ids))
        agr = float(ids_agreement(ids[:n], exact_ids[:n]))
        table.append({"budget": k, "agreement": round(agr, 4)})
        if agr >= target_agreement:
            # ascending ladder: the first qualifying K is the cheapest
            choice = k
            break
    return {
        "temporal_thresh": round(thresh, 3),
        "temporal_budget": choice,
        "drift_mean": round(drift_mean, 3),
        "target_agreement": target_agreement,
        "calib_frames": len(frames),
        "table": table,
    }
