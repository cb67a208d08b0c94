"""RMCDB cyclic-diagonal structured lowering: the roll+compact matmul
experiment (VERDICT round-3 item 5).

An RMCDB mask (tpuseg.sparsity.rmcdb; reference RmcdbPruner.py:271-283)
keeps, per surviving (bh x bw) block, a few CYCLIC DIAGONALS of
(b x b) blocklets: blocklet-row r is connected to blocklet-col
(r + d) % nbl.  That shift-regularity means the block's action is not a
general gather: rolling the input's blocklet dimension by -d aligns every
kept blocklet onto the block diagonal, turning each kept diagonal into ONE
batched (b x b) blocklet matmul:

    y[:, rb, r, :] += x[:, cb, (r+d) % nbl, :] @ V[r]      for all r
  = roll(x_cb, -d, blocklet axis) batched-matmul V          (one einsum)

FLOPs are exactly the kept-diagonal count — the same arithmetic the
reference's external CUDA kernels exploit (optimal_configs exec_args).

The MXU question this experiment answers: a batched (P, b) @ (b, b)
einsum contracts over only b lanes (blocklets are 4-16 wide in every
shipped RMCDB geometry), i.e. <= b/128 of the MXU's contraction
dimension.  The FLOP cut is count*b/bw; the efficiency loss is ~128/b.
For every realistic geometry (b <= 16) the loss exceeds the cut by an
order of magnitude — the same tile-granularity physics that made fine
RBGP blocklets coarsen to dense (tpuseg.ops.rbgp_matmul docstring).  The
kernel below exists to MEASURE that on hardware (bench_sparse --rmcdb)
rather than assert it; if measurement confirms, the pruner-family serving
matrix is closed: RMCDB masks serve dense (or block-coarsened when their
global (bh, bw) geometry is MXU-sized).

Scope: the collapsed-matmul case (1x1 convs / the classifier fc layers
RMCDB targets in rmbsnn); conv taps would wrap the same primitive.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RmcdbRollPlan:
    """Per distinct offset d: the (rb, cb) block pairs keeping that
    diagonal and their compact blocklet weights."""

    # dict offset -> (rb_idx (Q,), cb_idx (Q,), vals (Q, nbl, b, b))
    per_offset: dict
    bh: int
    bw: int
    b: int
    rows: int
    cols: int
    density: float


def detect_rmcdb_rolls(
    w_ko: np.ndarray,
    mask_ko: np.ndarray,
    bh: int,
    bw: int,
    b: int,
    dtype=jnp.bfloat16,
) -> RmcdbRollPlan | None:
    """Build a roll plan from a realized (K, O)-transposed... no:
    ``w_ko``/``mask_ko`` are (rows, cols) = (O, K) matrices in the
    masker's own orientation.  Returns None unless the mask is EXACTLY a
    union of full cyclic blocklet diagonals per (bh x bw) block (which
    every rmcdb-generated mask is by construction).
    """
    rows, cols = mask_ko.shape
    if rows % bh or cols % bw or bh % b or bw % b or bh // b != bw // b:
        # cyclic diagonals need square blocklet grids (rmcdb indexes
        # bl_ncb cols by bl_nrb rows mod nbl)
        return None
    nbl = bh // b
    nrb, ncb = rows // bh, cols // bw
    # working copy zeroed as diagonals are extracted: a spurious extra
    # offset whose slots happen to be covered by real diagonals' union
    # then extracts zeros (harmless) instead of double-counting weights
    wm = np.asarray(w_ko, np.float32) * np.asarray(mask_ko, np.float32)
    per_offset: dict[int, list] = {}
    covered = np.zeros_like(mask_ko, dtype=bool)
    m = np.asarray(mask_ko) != 0
    for rb in range(nrb):
        for cb in range(ncb):
            blk = m[rb * bh : (rb + 1) * bh, cb * bw : (cb + 1) * bw]
            if not blk.any():
                continue
            # blocklet occupancy grid (nbl, nbl)
            occ = blk.reshape(nbl, b, nbl, b).any(axis=(1, 3))
            for d in range(nbl):
                rows_i = np.arange(nbl)
                if occ[rows_i, (rows_i + d) % nbl].all():
                    vals = np.zeros((nbl, b, b), np.float32)
                    for r in range(nbl):
                        c = (r + d) % nbl
                        sl = (
                            slice(rb * bh + r * b, rb * bh + (r + 1) * b),
                            slice(cb * bw + c * b, cb * bw + (c + 1) * b),
                        )
                        vals[r] = wm[sl]
                        wm[sl] = 0.0
                        covered[sl] = True
                    per_offset.setdefault(d, []).append((rb, cb, vals))
    if not per_offset or not covered[m].all():
        return None  # mask has live entries outside full cyclic diagonals
    packed = {}
    for d, items in per_offset.items():
        rb_idx = np.array([it[0] for it in items], np.int32)
        cb_idx = np.array([it[1] for it in items], np.int32)
        vals = jnp.asarray(np.stack([it[2] for it in items]), dtype)
        packed[d] = (rb_idx, cb_idx, vals)
    return RmcdbRollPlan(
        per_offset=packed,
        bh=bh,
        bw=bw,
        b=b,
        rows=rows,
        cols=cols,
        density=float(m.mean()),
    )


def rmcdb_roll_matmul(x: jax.Array, plan: RmcdbRollPlan) -> jax.Array:
    """y (P, rows) = x (P, cols) @ (W*mask)^T via roll + batched blocklet
    einsums — FLOPs exactly at the kept-diagonal count.

    The masker orientation is (rows=out, cols=in), i.e. y = x W^T.
    """
    P = x.shape[0]
    nbl, b = plan.bh // plan.b, plan.b
    nrb = plan.rows // plan.bh
    xb = x.reshape(P, plan.cols // plan.bw, nbl, b)
    y = jnp.zeros((P, nrb, nbl, b), x.dtype)
    for d, (rb_idx, cb_idx, vals) in sorted(plan.per_offset.items()):
        # gather the Q source blocks and roll their blocklet axis so the
        # kept diagonal sits on the (now aligned) block diagonal
        xg = jnp.roll(xb[:, cb_idx], -d, axis=2)  # (P, Q, nbl, b)
        # y^T = V x^T per blocklet: y[p,q,n,i] = sum_k vals[q,n,i,k] xg[p,q,n,k]
        contrib = jnp.einsum(
            "pqnk,qnik->pqni", xg, vals.astype(x.dtype)
        )
        y = y.at[:, rb_idx].add(contrib)
    return y.reshape(P, plan.rows)
