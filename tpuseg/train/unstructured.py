"""Unstructured magnitude pruning.

Behavioral reference: semseg_unstructured.py:769-777 — per-conv-layer L1
(magnitude) unstructured pruning at a global sparsity fraction, equivalent to
``torch.nn.utils.prune.l1_unstructured(module, 'weight', amount=sparsity)``:
zero the ``floor(sparsity * size)`` smallest-|w| entries of each layer.
Also covers semseg_baseline.py:752's ``random_unstructured`` mode.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np


def magnitude_unstructured_masks(
    params: Mapping[str, np.ndarray],
    sparsity: float,
    layers: Iterable[str] | None = None,
) -> dict[str, np.ndarray]:
    """L1-unstructured masks for conv layers.

    ``layers=None`` targets every 4-D weight except the frozen upsampler —
    matching the reference's "every Conv2d module" sweep.
    """
    if layers is None:
        layers = [
            k
            for k, v in params.items()
            if np.asarray(v).ndim == 4 and k != "up.weight"
        ]
    masks = {}
    for k in layers:
        w = np.asarray(params[k])
        n_prune = int(sparsity * w.size)  # torch prune uses round? floor via int
        mask = np.ones(w.size, dtype=np.float32)
        if n_prune > 0:
            idx = np.argpartition(np.abs(w).ravel(), n_prune - 1)[:n_prune]
            mask[idx] = 0.0
        masks[k] = mask.reshape(w.shape)
    return masks


def random_unstructured_masks(
    params: Mapping[str, np.ndarray],
    sparsity: float,
    rng: np.random.Generator,
    layers: Iterable[str] | None = None,
) -> dict[str, np.ndarray]:
    if layers is None:
        layers = [
            k
            for k, v in params.items()
            if np.asarray(v).ndim == 4 and k != "up.weight"
        ]
    masks = {}
    for k in layers:
        w = np.asarray(params[k])
        n_prune = int(sparsity * w.size)
        mask = np.ones(w.size, dtype=np.float32)
        if n_prune > 0:
            mask[rng.choice(w.size, n_prune, replace=False)] = 0.0
        masks[k] = mask.reshape(w.shape)
    return masks


def measure_global_sparsity(
    params: Mapping[str, np.ndarray], masks: Mapping[str, np.ndarray] | None = None
) -> tuple[int, int, float]:
    """(num_zeros, num_elements, sparsity) over conv weights
    (semseg_unstructured.py:108-136)."""
    zeros = 0
    total = 0
    for k, v in params.items():
        arr = np.asarray(v)
        if arr.ndim != 4 or k == "up.weight":
            continue
        if masks and k in masks:
            arr = arr * np.asarray(masks[k])
        zeros += int(arr.size - np.count_nonzero(arr))
        total += arr.size
    return zeros, total, zeros / total if total else 0.0
