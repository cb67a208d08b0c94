"""Checkpoint / model statistics tools.

Behavioral reference:
- tools/get_sparsity_stats.py:15-61 — per-layer overall/filter/channel/
  row/col sparsity from a checkpoint, optional block-level occupancy
- tools/get_matrix_shapes.py:7-64 — per-conv/FC (M, K, N) GEMM shapes and
  FLOPs for kernel tuning (hook-based in the reference; computed from the
  static spec here)
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from tpuseg.sparsity.base import hwio_to_oihw


def get_sparsity_stats(
    params: Mapping[str, np.ndarray],
    block: tuple[int, int] | None = None,
) -> dict[str, dict]:
    """Per-layer sparsity breakdown over conv/FC weights."""
    out = {}
    for name, v in params.items():
        arr = np.asarray(v)
        if arr.ndim not in (2, 4) or name == "up.weight":
            continue
        w = hwio_to_oihw(arr)
        mat = w.reshape(w.shape[0], -1)
        nz = mat != 0
        stats = {
            "shape": list(w.shape),
            "overall_sparsity": float(1 - nz.mean()),
            "row_sparsity": float((~nz.any(axis=1)).mean()),
            "col_sparsity": float((~nz.any(axis=0)).mean()),
        }
        if w.ndim == 4:
            stats["filter_sparsity"] = float(
                (~nz.reshape(w.shape[0], -1).any(axis=1)).mean()
            )
            stats["channel_sparsity"] = float(
                (~(w != 0).any(axis=(0, 2, 3))).mean()
            )
        if block is not None:
            bh, bw = block
            m, k = mat.shape
            if m % bh == 0 and k % bw == 0:
                blocks = nz.reshape(m // bh, bh, k // bw, bw).any(axis=(1, 3))
                stats["block_occupancy"] = float(blocks.mean())
        out[name] = stats
    return out


def get_matrix_shapes(spec, input_hw: tuple[int, int] = (512, 512)) -> list[dict]:
    """Per-conv GEMM shapes (M, K, N) = (OFM, IFM*kh*kw, OH*OW) and FLOPs,
    walking the static DrnSpec (the reference extracts the same via forward
    hooks, get_matrix_shapes.py:7-64)."""
    from tpuseg.models.drn import DrnSpec

    assert isinstance(spec, DrnSpec)
    h, w = input_hw
    out = []

    def add(cdef, h, w):
        oh = (h + 2 * cdef.padding - cdef.dilation * (cdef.kernel - 1) - 1) // cdef.stride + 1
        ow = (w + 2 * cdef.padding - cdef.dilation * (cdef.kernel - 1) - 1) // cdef.stride + 1
        M = cdef.cout
        K = cdef.cin * cdef.kernel * cdef.kernel
        N = oh * ow
        out.append(
            {"name": cdef.name, "M": M, "K": K, "N": N, "flops": 2 * M * K * N}
        )
        return oh, ow

    for _, stage in spec.stages:
        if stage.kind == "convs":
            for cdef, _bn in stage.convs:
                h, w = add(cdef, h, w)
        else:
            for blk in stage.blocks:
                bh, bw_ = h, w
                for cdef in blk.convs:
                    bh, bw_ = add(cdef, bh, bw_)
                if blk.downsample is not None:
                    add(blk.downsample[0], h, w)
                h, w = bh, bw_
    return out
