"""Sparsity-aware re-initialization ("rejig").

Behavioral reference: semantic_seg.py:1032-1056 / rmbsnn_main.py:360-385 —
for static masks, re-draw the surviving weights with a sparsity-corrected He
std: ``n = nnz // mask.shape[1]`` in the (OFM, IFM, kh, kw) view, conv
weights ~ N(0, sqrt(2/n)), FC weights ~ N(0, 0.01).
"""

from __future__ import annotations

import math
from typing import Mapping

import numpy as np

from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio


def sparsity_aware_reinit(
    params: Mapping[str, np.ndarray],
    masks: Mapping[str, np.ndarray],
    rng: np.random.Generator,
) -> dict[str, np.ndarray]:
    """Return params with every masked layer re-drawn at its surviving
    positions (host-side numpy; storage layout in/out)."""
    out = dict(params)
    for layer, mask in masks.items():
        tensor = hwio_to_oihw(np.asarray(params[layer], dtype=np.float32))
        m = hwio_to_oihw(np.asarray(mask))
        nnz = int(np.count_nonzero(m))
        n = nnz // m.shape[1] if m.shape[1] else nnz
        fresh = np.zeros_like(tensor)
        if tensor.ndim == 2:
            vals = rng.normal(0.0, 0.01, size=nnz)
        else:
            vals = rng.normal(0.0, math.sqrt(2.0 / max(n, 1)), size=nnz)
        fresh[np.nonzero(m)] = vals
        out[layer] = oihw_to_hwio(fresh.astype(np.float32))
    return out
