"""Pallas TPU block-sparse (BSR) matmul.

This is the TPU-native replacement for the reference's *external* CUDA SpMM
kernels (the ones parameterized by ``make_kwargs`` in optimal_configs/*.json
and fed by the BSR text dumps — SURVEY.md §2.2 native-code ledger).  The
reference only simulates sparsity (dense conv x 0/1 mask); here the pruned
blocks are actually skipped.

Layout:  y[M, N] = W_sparse[M, K] @ x[K, N]

- W is packed as dense value tiles ``vals[nnzb, BM, BK]`` (one entry per
  nonzero block, row-major by row-block) plus CSR-style ``rowptr[nrb+1]``
  and ``colidx[nnzb]`` — produced host-side from any 0/1 mask by
  ``pack_bsr`` (mask coarsened to the kernel's block grid).
- The kernel walks ``k`` (position within a row-block's nonzero list) as the
  innermost sequential grid dimension; the x tile for step k is DMA'd by the
  BlockSpec index_map using the scalar-prefetched ``colidx`` — the classic
  Pallas block-gather pattern.  Padded steps (row-blocks with fewer blocks
  than the densest row) re-fetch the last valid tile and are masked out of
  the accumulation with ``pl.when``.

MXU economics: profitable when the mask's nonzero structure is coarse at
(BM >= 8, BK = 128) granularity — e.g. BlockPruner/HB configs with large
blocks, GroupING masks, or high-sparsity RBGP at 87.5%.  Fine 1x1/2x2 RBGP
blocklets at 50% coarsen to fully-dense 128-tiles; those layers should stay
on the dense path (``plan_bsr`` reports the achieved block-level sparsity so
callers can decide).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass
class BsrWeights:
    """Host-packed BSR operand."""

    vals: jax.Array  # (nnzb, BM, BK)
    rowptr: np.ndarray  # (nrb + 1,) int32, static
    colidx: np.ndarray  # (nnzb,) int32, static
    shape: tuple[int, int]  # (M, K) dense shape
    bm: int
    bk: int

    @property
    def nrb(self) -> int:
        return self.shape[0] // self.bm

    @property
    def max_nnzb_row(self) -> int:
        return int(np.max(np.diff(self.rowptr))) if len(self.colidx) else 0

    @property
    def block_density(self) -> float:
        total = self.nrb * (self.shape[1] // self.bk)
        return len(self.colidx) / total if total else 1.0


def pack_bsr(
    w: np.ndarray, mask: np.ndarray, bm: int = 128, bk: int = 128, dtype=jnp.bfloat16
) -> BsrWeights:
    """Pack a masked dense matrix (M, K) into BSR tiles.

    The mask is coarsened to the (bm, bk) grid: a block is kept iff it has
    any nonzero mask entry.
    """
    M, K = w.shape
    assert M % bm == 0 and K % bk == 0, (M, K, bm, bk)
    nrb, ncb = M // bm, K // bk
    wm = (w * mask).reshape(nrb, bm, ncb, bk).transpose(0, 2, 1, 3)
    coarse = mask.reshape(nrb, bm, ncb, bk).transpose(0, 2, 1, 3).reshape(
        nrb, ncb, -1
    ).any(axis=-1)
    rowptr = np.zeros(nrb + 1, dtype=np.int32)
    cols = []
    tiles = []
    for i in range(nrb):
        nz = np.flatnonzero(coarse[i])
        cols.extend(nz.tolist())
        tiles.extend(wm[i, j] for j in nz)
        rowptr[i + 1] = rowptr[i] + len(nz)
    vals = (
        np.stack(tiles).astype(np.float32)
        if tiles
        else np.zeros((0, bm, bk), np.float32)
    )
    return BsrWeights(
        vals=jnp.asarray(vals, dtype),
        rowptr=rowptr,
        colidx=np.asarray(cols, np.int32),
        shape=(M, K),
        bm=bm,
        bk=bk,
    )


def bsr_matmul(
    bsr: BsrWeights,
    x: jax.Array,
    bn: int = 256,
    out_dtype=jnp.float32,
) -> jax.Array:
    """y = W_sparse @ x with x (K, N) -> y (M, N)."""
    M, K = bsr.shape
    N = x.shape[1]
    assert x.shape[0] == K
    bn = min(bn, N)
    assert N % bn == 0, (N, bn)
    nrb = bsr.nrb
    maxb = max(bsr.max_nnzb_row, 1)

    rowptr = jnp.asarray(bsr.rowptr)
    nnzb_per_row = jnp.asarray(np.diff(bsr.rowptr).astype(np.int32))
    # clamped flat block index per (row, step): pad steps re-fetch the last
    # valid block of the row (masked out of the accumulation)
    steps = np.arange(maxb)[None, :]
    flat = np.minimum(
        bsr.rowptr[:-1, None] + steps, np.maximum(bsr.rowptr[1:, None] - 1, 0)
    ).astype(np.int32)
    colmap = (
        bsr.colidx[flat.reshape(-1)].reshape(nrb, maxb)
        if len(bsr.colidx)
        else np.zeros((nrb, maxb), np.int32)
    )
    flatmap = jnp.asarray(flat)
    colmap = jnp.asarray(colmap)

    grid = (nrb, N // bn, maxb)

    def vals_map(i, j, k, flatmap_ref, colmap_ref, nnzb_ref):
        return (flatmap_ref[i, k], 0, 0)

    def x_map(i, j, k, flatmap_ref, colmap_ref, nnzb_ref):
        return (colmap_ref[i, k], j)

    def y_map(i, j, k, flatmap_ref, colmap_ref, nnzb_ref):
        return (i, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bsr.bm, bsr.bk), vals_map),
            pl.BlockSpec((bsr.bk, bn), x_map),
        ],
        out_specs=pl.BlockSpec((bsr.bm, bn), y_map),
    )

    def kernel(flatmap_ref, colmap_ref, nnzb_ref, vals_ref, x_ref, y_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        @pl.when(k < nnzb_ref[pl.program_id(0)])
        def _acc():
            y_ref[:] += jnp.dot(
                vals_ref[0], x_ref[:], preferred_element_type=jnp.float32
            ).astype(y_ref.dtype)

    flops = 2 * len(bsr.colidx) * bsr.bm * bsr.bk * N
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bsr.vals.size * 2 + x.size * 2 + M * N * 4,
            transcendentals=0,
        ),
    )(flatmap, colmap, nnzb_per_row, bsr.vals, x.astype(bsr.vals.dtype))
    return y


def bsr_matmul_gathered(
    bsr: BsrWeights,
    x: jax.Array,
    bn: int = 2048,
    out_dtype=jnp.float32,
) -> jax.Array:
    """v2 kernel: per (row-block, N-tile), DMA-gather the row's K-support
    into a contiguous VMEM scratch, then issue ONE (BM x S*BK) @ (S*BK x BN)
    dot instead of S small ones.

    All rows are padded to the densest row's block count S (padded slots
    gather block 0 of the row and multiply zero weight tiles, so the result
    is exact).  The large dot keeps the MXU busy for S*BK >= 512 contraction
    depth, amortizing the per-block bookkeeping that limits ``bsr_matmul``.
    """
    M, K = bsr.shape
    N = x.shape[1]
    assert x.shape[0] == K
    bn = min(bn, N)
    assert N % bn == 0
    nrb = bsr.nrb
    S = max(bsr.max_nnzb_row, 1)
    bm, bk = bsr.bm, bsr.bk

    # Re-pack values row-padded: (nrb, S, bm, bk); pad tiles are zeros.
    vals = np.zeros((nrb, S, bm, bk), np.float32)
    cols = np.zeros((nrb, S), np.int32)
    host_vals = np.asarray(bsr.vals, np.float32)
    for i in range(nrb):
        lo, hi = bsr.rowptr[i], bsr.rowptr[i + 1]
        n = hi - lo
        if n:
            vals[i, :n] = host_vals[lo:hi]
            cols[i, :n] = bsr.colidx[lo:hi]
    # lay out each row's support as one (bm, S*bk) matrix so the kernel does
    # a single dot with no output transpose
    vals_dev = jnp.asarray(
        vals.transpose(0, 2, 1, 3).reshape(nrb, bm, S * bk), bsr.vals.dtype
    )
    cols_dev = jnp.asarray(cols)

    def kernel(cols_ref, vals_ref, x_hbm, y_ref, xg, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def gather(s, _):
            c = cols_ref[i, s]
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(c * bk, bk), pl.ds(j * bn, bn)],
                xg.at[pl.ds(s * bk, bk), :],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, S, gather, 0)
        y_ref[:] = jax.lax.dot_general(
            vals_ref[0],
            xg[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y_ref.dtype)

    grid = (nrb, N // bn)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cols (nrb, S)
            pl.BlockSpec((1, bm, S * bk), lambda i, j: (i, 0, 0)),
            # x stays whole in HBM (ANY requires a trivial index_map);
            # the kernel DMA-gathers (bk, bn) slices of it manually
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((S * bk, bn), bsr.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * S * bm * bk * N,
            bytes_accessed=vals_dev.size * 2 + x.size * 2 + M * N * 4,
            transcendentals=0,
        ),
    )(cols_dev, vals_dev, x.astype(bsr.vals.dtype))
    return y


def masked_dense_matmul(w, mask, x):
    """The reference's simulated-sparsity semantics (dense x 0/1 mask) for
    correctness comparison."""
    return (w * mask) @ x
