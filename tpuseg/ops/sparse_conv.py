"""Block-sparse convolution lowering.

Turns a masked conv weight into real skipped work on the MXU:

- the (kh*kw) taps of a conv are each a (Cin, Cout) matmul over the pixel
  dimension; a masked weight gives every tap its own block-sparsity pattern;
- activations stay NHWC: the kernel computes  y[P, Cout] += x_tap[P, Cin] @
  W_tap[Cin, Cout]  with the *weight column blocks* gathered per output
  row-block (``bsr_matmul_xw``), so no activation transposes are needed;
- a per-layer plan coarsens the mask to the (BK, BM) = (128, 128) kernel
  grid and picks sparse vs dense per tap: fine-grained RBGP blocklets
  (1x1/2x2 at 50%) coarsen to fully dense and stay on the dense path —
  skipping work below one MXU tile is not physically possible — while
  BlockPruner/HB/grouping masks with coarse geometry and high sparsity get
  real wall-clock wins (see bench_sparse.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pl_call(*args, **kw):
    """``pl.pallas_call`` with interpret-mode fallback off-TPU.

    These kernels use TPU Mosaic primitives (pltpu.*); on the CPU backend
    (the test mesh, CPU dryruns, ``--sparse-exec`` smoke runs) they execute
    through the Pallas interpreter instead of Mosaic.  An explicit
    ``interpret=`` kwarg (or a test monkeypatch of ``pl.pallas_call``)
    still wins."""
    if "interpret" not in kw and jax.default_backend() == "cpu":
        kw["interpret"] = True
    return pl.pallas_call(*args, **kw)


@dataclasses.dataclass
class XwBsr:
    """Column-block-sparse weight for y = x @ W (W: (K, M))."""

    vals: jax.Array  # (ncb_out, S*BK, BM) row-padded support per out col-block
    rows: jax.Array  # (ncb_out, S) int32 K-block indices (padded w/ repeats)
    shape: tuple[int, int]  # (K, M)
    bk: int
    bm: int
    s: int
    block_density: float


def pack_xw_bsr(w_km: np.ndarray, bk: int = 128, bm: int = 128, dtype=jnp.bfloat16) -> XwBsr:
    """Pack a masked (K, M) weight: for each M-block, keep the K-blocks with
    any nonzero, padded to the densest column's count."""
    K, M = w_km.shape
    assert K % bk == 0 and M % bm == 0
    nkb, nmb = K // bk, M // bm
    blocks = w_km.reshape(nkb, bk, nmb, bm)
    nz = np.abs(blocks).sum(axis=(1, 3)) > 0  # (nkb, nmb)
    counts = nz.sum(axis=0)
    S = max(int(counts.max()), 1)
    vals = np.zeros((nmb, S, bk, bm), np.float32)
    rows = np.zeros((nmb, S), np.int32)
    for j in range(nmb):
        ks = np.flatnonzero(nz[:, j])
        for s, k in enumerate(ks):
            vals[j, s] = blocks[k, :, j, :]
            rows[j, s] = k
    return XwBsr(
        vals=jnp.asarray(vals.reshape(nmb, S * bk, bm), dtype),
        rows=jnp.asarray(rows),
        shape=(K, M),
        bk=bk,
        bm=bm,
        s=S,
        block_density=float(nz.mean()),
    )


def bsr_matmul_xw(x: jax.Array, w: XwBsr, bp: int = 512, out_dtype=jnp.float32) -> jax.Array:
    """y (P, M) = x (P, K) @ W_sparse (K, M), gathering x's K-columns per
    output column-block via DMA."""
    P, K = x.shape
    assert K == w.shape[0]
    M = w.shape[1]
    bp = min(bp, P)
    assert P % bp == 0, (P, bp)
    S, bk, bm = w.s, w.bk, w.bm

    def kernel(rows_ref, vals_ref, x_hbm, y_ref, xg, sem):
        i = pl.program_id(0)  # P tile
        j = pl.program_id(1)  # M block

        def gather(s, _):
            k = rows_ref[j, s]
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * bp, bp), pl.ds(k * bk, bk)],
                xg.at[:, pl.ds(s * bk, bk)],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, S, gather, 0)
        y_ref[:] = jax.lax.dot_general(
            xg[:],
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y_ref.dtype)

    y = _pl_call(
        kernel,
        grid=(P // bp, M // bm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S * bk, bm), lambda i, j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bp, bm), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((P, M), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bp, S * bk), w.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (M // bm) * S * bk * bm * P,
            bytes_accessed=int(w.vals.size) * 2 + x.size * 2 + M * P * 4,
            transcendentals=0,
        ),
    )(w.rows, w.vals, x.astype(w.vals.dtype))
    return y


# --------------------------------------------------------------------------
# conv lowering
# --------------------------------------------------------------------------


@dataclasses.dataclass
class SparseConvPlan:
    taps: list  # list of (dy, dx, XwBsr | jnp dense (Cin, Cout))
    kernel: int
    dilation: int
    cin: int
    cout: int
    density: float  # mean coarsened block density across taps


def plan_sparse_conv(
    w_hwio: np.ndarray,
    mask_hwio: np.ndarray,
    dense_threshold: float = 0.9,
    dtype=jnp.bfloat16,
) -> SparseConvPlan:
    """Build per-tap sparse/dense lowerings from a masked HWIO weight.
    Only stride-1 convs are lowered (DRN's FLOP-heavy dilated layers are
    stride 1)."""
    kh, kw, cin, cout = w_hwio.shape
    wm = np.asarray(w_hwio, np.float32) * np.asarray(mask_hwio, np.float32)
    taps = []
    densities = []
    for p in range(kh):
        for q in range(kw):
            km = wm[p, q]  # (Cin, Cout)
            if cin % 128 or cout % 128:
                taps.append((p, q, jnp.asarray(km, dtype)))
                densities.append(1.0)
                continue
            packed = pack_xw_bsr(km, dtype=dtype)
            densities.append(packed.block_density)
            if packed.block_density >= dense_threshold:
                taps.append((p, q, jnp.asarray(km, dtype)))
            else:
                taps.append((p, q, packed))
    return SparseConvPlan(
        taps=taps, kernel=kh, dilation=1, cin=cin, cout=cout,
        density=float(np.mean(densities)),
    )


@dataclasses.dataclass
class FusedSparseConv:
    """Packed operand for the fused-tap sparse conv kernel."""

    vals: jax.Array   # (nmb, T*S*bk, bm) — per out-block, taps x support stacked
    rows: jax.Array   # (nmb, T*S) int32 K-block index per gather slot
    taps: np.ndarray  # (T, 2) (dy, dx) pixel offsets into the padded input
    s: int            # support slots per tap (padded)
    bk: int
    bm: int
    kernel: int
    dilation: int
    cin: int
    cout: int
    block_density: float
    rows_per_tile: int = 8


def plan_fused_sparse_conv(
    w_hwio: np.ndarray,
    mask_hwio: np.ndarray,
    dilation: int = 1,
    dtype=jnp.bfloat16,
    bk: int = 128,
    bm: int = 128,
    rows_per_tile: int = 8,
) -> FusedSparseConv:
    """Pack a masked stride-1 conv for the fused kernel.

    Per output-channel block, the *union* over taps of nonzero input-channel
    blocks is gathered (padded to the global max S); the weights are laid
    out tap-major on that union (zero tiles where a tap lacks a block), so
    the kernel's single dot computes at union density.  Spatial tap shifts
    happen as static register slices of the gathered halo slab — TPU DMA
    cannot slice the tiled W dimension at non-8-multiple offsets.
    """
    kh, kw, cin, cout = w_hwio.shape
    assert cin % bk == 0 and cout % bm == 0
    wm = np.asarray(w_hwio, np.float32) * np.asarray(mask_hwio, np.float32)
    nkb, nmb = cin // bk, cout // bm
    T = kh * kw
    nz = np.zeros((nmb, T, nkb), bool)
    for t in range(T):
        p, q = divmod(t, kw)
        blocks = wm[p, q].reshape(nkb, bk, nmb, bm)
        nz[:, t, :] = (np.abs(blocks).sum(axis=(1, 3)) > 0).T
    union = nz.any(axis=1)  # (nmb, nkb)
    S = max(int(union.sum(axis=1).max()), 1)
    vals = np.zeros((nmb, T, S, bk, bm), np.float32)
    rows = np.zeros((nmb, S), np.int32)
    for j in range(nmb):
        ks = np.flatnonzero(union[j])
        for s_i, k in enumerate(ks):
            rows[j, s_i] = k
            for t in range(T):
                p, q = divmod(t, kw)
                if nz[j, t, k]:
                    vals[j, t, s_i] = wm[p, q][
                        k * bk : (k + 1) * bk, j * bm : (j + 1) * bm
                    ]
    taps = np.array(
        [(p * dilation, q * dilation) for p in range(kh) for q in range(kw)],
        np.int32,
    )
    return FusedSparseConv(
        vals=jnp.asarray(vals.reshape(nmb, T * S * bk, bm), dtype),
        rows=jnp.asarray(rows),
        taps=taps,
        s=S,
        bk=bk,
        bm=bm,
        kernel=kh,
        dilation=dilation,
        cin=cin,
        cout=cout,
        block_density=float(union.mean()),
        rows_per_tile=rows_per_tile,
    )


def fused_sparse_conv_apply(
    x: jax.Array, plan: FusedSparseConv, rows_per_tile: int | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Stride-1 'same' sparse conv.

    Per (spatial tile, out-channel block): DMA one halo slab per union
    support slot (aligned offsets only: H rows at tile granularity, full
    padded width, 128-aligned channels), slice the taps out of the slab in
    registers (static offsets), concat tap-major, and issue ONE
    (R*W x T*S*bk) @ (T*S*bk x bm) dot.
    """
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = plan.rows_per_tile if rows_per_tile is None else rows_per_tile
    while R > 1 and h % R:
        # odd feature grids (e.g. 300x300 inputs -> 38-row stride-8 grid)
        # fall back to the largest tile height that divides h
        R -= 1
    assert h % R == 0, (h, R)
    # padded W rounded up to the sublane tiling (8) — Mosaic requires DMA
    # slice shapes on the tiled W dim to be 8-aligned; shared between the
    # VMEM estimate and the actual pad so the two can't drift
    wp = -(-(w_ + 2 * pad) // 8) * 8
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    # VMEM budget: slab (R+2p, wp, S*bk) + xmat (R*w, T*S*bk) + dot output.
    # R=16 already exceeds the 16MB scoped limit at DRN layer-6 sizes
    # (measured); keep tiles small.
    est = (R * w_ * T * S * bk + (R + 2 * pad) * wp * S * bk) * itemsize
    assert est < 12 * 2**20, (
        f"fused sparse conv tile too large for VMEM (~{est/2**20:.1f} MB); "
        f"reduce rows_per_tile (R={R})"
    )
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, wp - w_ - pad), (0, 0)),
    )
    taps_np = plan.taps

    def kernel_fn(rows_ref, vals_ref, xp_hbm, y_ref, xg, sem):
        ij = pl.program_id(0)
        jb = pl.program_id(1)
        nb = ij // (h // R)
        hb = ij % (h // R)

        def gather(s, _):
            kblk = rows_ref[jb, s]
            cp = pltpu.make_async_copy(
                xp_hbm.at[
                    nb,
                    pl.ds(hb * R, R + 2 * pad),
                    pl.ds(0, wp),
                    pl.ds(kblk * bk, bk),
                ],
                xg.at[:, :, pl.ds(s * bk, bk)],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, S, gather, 0)
        slab = xg[:]  # (R + 2*pad, wp, S*bk)
        parts = []
        for t in range(T):  # static unroll: offsets are Python ints
            dy, dx = int(taps_np[t, 0]), int(taps_np[t, 1])
            sl = jax.lax.slice(
                slab, (dy, dx, 0), (dy + R, dx + w_, S * bk)
            ).reshape(R * w_, S * bk)
            parts.append(sl)
        xmat = jnp.concatenate(parts, axis=1)  # (R*w, T*S*bk)
        y_ref[:] = jax.lax.dot_general(
            xmat,
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, R, w_, bm).astype(y_ref.dtype)

    nmb = plan.cout // bm
    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R), nmb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rows (nmb, S)
            pl.BlockSpec((1, T * S * bk, bm), lambda ij, jb: (jb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, bm), lambda ij, jb: (ij // (h // R), ij % (h // R), 0, jb)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * pad, wp, S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size) * 2
            + int(xp.size) * 2 * nmb
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.rows, plan.vals, xp)
    return y


@dataclasses.dataclass
class SharedFusedSparseConv:
    """Packed operand for the shared-union fused kernel: ONE K-support for
    the whole layer (union over taps AND output blocks) — gathered once per
    spatial tile with static indices, all output blocks computed in-kernel."""

    vals: jax.Array  # (nmb, T*S*bk, bm) on the global-union layout
    rows: tuple      # (S,) static python ints — global union K-block ids
    taps: np.ndarray
    s: int
    bk: int
    bm: int
    kernel: int
    dilation: int
    cin: int
    cout: int
    union_density: float


def plan_shared_sparse_conv(
    w_hwio: np.ndarray,
    mask_hwio: np.ndarray,
    dilation: int = 1,
    dtype=jnp.bfloat16,
    bk: int = 128,
    bm: int = 128,
) -> SharedFusedSparseConv:
    kh, kw, cin, cout = w_hwio.shape
    assert cin % bk == 0 and cout % bm == 0
    wm = np.asarray(w_hwio, np.float32) * np.asarray(mask_hwio, np.float32)
    nkb, nmb = cin // bk, cout // bm
    T = kh * kw
    nz = np.zeros((T, nkb, nmb), bool)
    for t in range(T):
        p, q = divmod(t, kw)
        blocks = wm[p, q].reshape(nkb, bk, nmb, bm)
        nz[t] = np.abs(blocks).sum(axis=(1, 3)) > 0
    union = nz.any(axis=(0, 2))  # (nkb,) global union
    rows = tuple(int(k) for k in np.flatnonzero(union)) or (0,)
    S = len(rows)
    vals = np.zeros((nmb, T, S, bk, bm), np.float32)
    for j in range(nmb):
        for t in range(T):
            p, q = divmod(t, kw)
            for s_i, k in enumerate(rows):
                if nz[t, k, j]:
                    vals[j, t, s_i] = wm[p, q][
                        k * bk : (k + 1) * bk, j * bm : (j + 1) * bm
                    ]
    taps = np.array(
        [(p * dilation, q * dilation) for p in range(kh) for q in range(kw)],
        np.int32,
    )
    return SharedFusedSparseConv(
        vals=jnp.asarray(vals.reshape(nmb, T * S * bk, bm), dtype),
        rows=rows,
        taps=taps,
        s=S,
        bk=bk,
        bm=bm,
        kernel=kh,
        dilation=dilation,
        cin=cin,
        cout=cout,
        union_density=S / nkb,
    )


def shared_sparse_conv_apply(
    x: jax.Array, plan: SharedFusedSparseConv, rows_per_tile: int = 8,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Shared-union fused sparse conv: the support slab is gathered ONCE per
    spatial tile (static offsets) and reused by every output-channel block,
    trading FLOPs (compute at union density) for a ~nmb-fold DMA reduction
    vs ``fused_sparse_conv_apply``."""
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = rows_per_tile
    nmb = plan.cout // bm
    while R > 1 and h % R:
        # odd feature grids (e.g. 300x300 inputs -> 38-row stride-8 grid)
        # fall back to the largest tile height that divides h, matching
        # every sibling kernel
        R -= 1
    assert h % R == 0, (h, R)
    wp = -(-(w_ + 2 * pad) // 8) * 8
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    est = (
        int(plan.vals.size) * itemsize          # all out-blocks' weights resident
        + (R + 2 * pad) * wp * S * bk * itemsize  # halo slab
        + R * w_ * plan.cout * 4                  # f32 output block
    )
    assert est < 13 * 2**20, (
        f"shared sparse conv footprint too large for VMEM (~{est/2**20:.1f} MB); "
        f"reduce rows_per_tile (R={R}) or use fused_sparse_conv_apply"
    )
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, wp - w_ - pad), (0, 0)),
    )
    taps_np = plan.taps
    rows = plan.rows

    def kernel_fn(vals_ref, xp_hbm, y_ref, xg, sem):
        ij = pl.program_id(0)
        nb = ij // (h // R)
        hb = ij % (h // R)

        for s_i, kblk in enumerate(rows):  # static offsets
            cp = pltpu.make_async_copy(
                xp_hbm.at[
                    nb,
                    pl.ds(hb * R, R + 2 * pad),
                    pl.ds(0, wp),
                    pl.ds(kblk * bk, bk),
                ],
                xg.at[:, :, pl.ds(s_i * bk, bk)],
                sem,
            )
            cp.start()
            cp.wait()
        slab = xg[:]
        # Per-tap 3D dot accumulation: contracting the slab slice's channel
        # dim directly avoids materializing the (R*w, T*S*bk) concat (which
        # costs ~5 MB of VMEM shuffles per tile).
        for jb in range(nmb):
            acc = None
            for t in range(T):
                dy, dx = int(taps_np[t, 0]), int(taps_np[t, 1])
                sl = jax.lax.slice(
                    slab, (dy, dx, 0), (dy + R, dx + w_, S * bk)
                )
                y = jax.lax.dot_general(
                    sl,
                    vals_ref[jb, t * S * bk : (t + 1) * S * bk, :],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
            y_ref[0, :, :, jb * bm : (jb + 1) * bm] = acc.astype(y_ref.dtype)

    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all out-blocks' weights
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, plan.cout), lambda ij: (ij // (h // R), ij % (h // R), 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * pad, wp, S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size) * 2 + int(xp.size) * 2
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.vals, xp)
    return y


def fused_phase_sparse_conv_apply(
    x: jax.Array, plan: FusedSparseConv, rows_per_tile: int | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Per-out-block phase-shifted fused sparse conv.

    Combines the per-out-block union packing of :func:`fused_sparse_conv_
    apply` (compute at per-column density, e.g. 0.125 at 87.5%) with the
    dx-phase pre-shift of :func:`phase_sparse_conv_apply` (no xmat concat,
    no sublane shuffles).  Measured motivation: the shared-union phase
    kernel pays union-over-out-blocks density (0.5 at 87.5% on random
    block masks — 4x the FLOPs), while the original fused kernel pays
    ~4.7 MB/tile of VMEM shuffles; this variant pays neither, at the cost
    of k x the halo-slab DMA (cheap: DMA was measured NOT the bottleneck).

    Same plan object as ``fused_sparse_conv_apply``; needs w % 8 == 0.
    """
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = plan.rows_per_tile if rows_per_tile is None else rows_per_tile
    while R > 1 and h % R:
        R -= 1
    assert h % R == 0, (h, R)
    assert w_ % 8 == 0, (
        f"fused_phase_sparse_conv_apply needs w % 8 == 0 (got {w_})"
    )
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    # BlockSpec'd operands (weights, output) are double-buffered by the
    # pipeline — count them twice; scratch is single-buffered (measured:
    # an 11.6 MB single-count estimate compiled to an 18.6 MB scoped
    # allocation and OOM'd the 16 MB vmem limit)
    est = (
        k * (R + 2 * pad) * w_ * S * bk * itemsize  # k phase slabs (scratch)
        + 2 * T * S * bk * bm * itemsize            # out-block weights (2x)
        + 2 * R * w_ * bm * 4                       # f32 output tile (2x)
    )
    assert est < 12 * 2**20, (
        f"fused phase sparse conv footprint ~{est/2**20:.1f} MB exceeds "
        f"VMEM; reduce rows_per_tile (R={R})"
    )
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    xpd = jnp.stack(
        [
            jax.lax.slice(
                xp, (0, 0, q * dil, 0), (n, h + 2 * pad, q * dil + w_, cin)
            )
            for q in range(k)
        ]
    )  # (k, n, h+2p, w_, cin)
    # tap order is hard-assumed row-major (p*dil, q*dil) via
    # divmod below; plan.taps is not consulted here

    def kernel_fn(rows_ref, vals_ref, xpd_hbm, y_ref, xg, sem):
        ij = pl.program_id(0)
        jb = pl.program_id(1)
        nb = ij // (h // R)
        hb = ij % (h // R)

        for q in range(k):  # static: phases
            def gather(s, _, q=q):
                kblk = rows_ref[jb, s]
                cp = pltpu.make_async_copy(
                    xpd_hbm.at[
                        q,
                        nb,
                        pl.ds(hb * R, R + 2 * pad),
                        pl.ds(0, w_),
                        pl.ds(kblk * bk, bk),
                    ],
                    xg.at[q, :, :, pl.ds(s * bk, bk)],
                    sem,
                )
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, S, gather, 0)
        acc = None
        for t in range(T):
            p_, q_ = divmod(t, k)
            dy = p_ * dil
            sl = xg[q_, dy : dy + R, :, :].reshape(R * w_, S * bk)
            yt = jax.lax.dot_general(
                sl,
                vals_ref[0, t * S * bk : (t + 1) * S * bk, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = yt if acc is None else acc + yt
        y_ref[:] = acc.reshape(1, R, w_, bm).astype(y_ref.dtype)

    nmb = plan.cout // bm
    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R), nmb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rows (nmb, S)
            pl.BlockSpec((1, T * S * bk, bm), lambda ij, jb: (jb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, bm),
            lambda ij, jb: (ij // (h // R), ij % (h // R), 0, jb),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((k, R + 2 * pad, w_, S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size) * 2
            + int(xpd.size) * 2 * nmb
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.rows, plan.vals, xpd)
    return y


def imcol_phase_sparse_conv_apply(
    x: jax.Array, plan: FusedSparseConv, rows_per_tile: int | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Direct-DMA im2col fused sparse conv — round-3, third formulation.

    Measured context (v5e, layer-6 shape, 87.5%): the original fused kernel
    (slab gather + 9 register tap-slices + concat + ONE dot) runs 0.84 ms —
    the tap slices/concat are ~0.55 ms of VMEM shuffles; the per-tap-dot
    phase variant eliminates the shuffles but splits the MXU contraction
    into 9 K=128 dots with an f32 VMEM accumulator and runs WORSE (1.13 ms:
    9 extra VPU passes over the 1 MB accumulator).  This version keeps the
    single K=T*S*bk dot AND eliminates the shuffles: each tap's operand
    block is DMA'd straight from the dx-phase HBM views into its column
    block of an im2col-layout VMEM buffer (lane offsets t*S*bk + s*bk are
    128-aligned, H source offsets are free, W offsets are 0 by phase
    pre-shift).  The cost moved to DMA: T*S slabs per (tile, out-block) =
    im2col traffic (~9x input bytes), which HBM sustains far cheaper than
    the VPU sustained the shuffles.
    """
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = plan.rows_per_tile if rows_per_tile is None else rows_per_tile
    while R > 1 and h % R:
        R -= 1
    assert h % R == 0, (h, R)
    assert w_ % 8 == 0, (
        f"imcol_phase_sparse_conv_apply needs w % 8 == 0 (got {w_})"
    )
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    est = (
        R * w_ * T * S * bk * itemsize      # im2col buffer (scratch)
        + 2 * T * S * bk * bm * itemsize    # out-block weights (2x pipeline)
        + 2 * R * w_ * bm * 4               # f32 output tile (2x pipeline)
    )
    assert est < 12 * 2**20, (
        f"imcol phase sparse conv footprint ~{est/2**20:.1f} MB exceeds "
        f"VMEM; reduce rows_per_tile (R={R})"
    )
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    xpd = jnp.stack(
        [
            jax.lax.slice(
                xp, (0, 0, q * dil, 0), (n, h + 2 * pad, q * dil + w_, cin)
            )
            for q in range(k)
        ]
    )  # (k, n, h+2p, w_, cin)

    def kernel_fn(rows_ref, vals_ref, xpd_hbm, y_ref, xm, sems):
        ij = pl.program_id(0)
        jb = pl.program_id(1)
        nb = ij // (h // R)
        hb = ij % (h // R)

        # start ALL T*S tap DMAs (independent engines), then wait — the
        # copies overlap each other; lane destinations t*S*bk + s*bk are
        # 128-aligned, H source offsets free, W offset 0 via phase views
        for t in range(T):
            p_, q_ = divmod(t, k)
            dy = p_ * dil

            def start(s, _, t=t, q_=q_, dy=dy):
                kblk = rows_ref[jb, s]
                pltpu.make_async_copy(
                    xpd_hbm.at[
                        q_,
                        nb,
                        pl.ds(hb * R + dy, R),
                        pl.ds(0, w_),
                        pl.ds(kblk * bk, bk),
                    ],
                    xm.at[:, :, pl.ds(t * S * bk + s * bk, bk)],
                    sems.at[t],
                ).start()
                return 0

            jax.lax.fori_loop(0, S, start, 0)
        for t in range(T):
            def wait(s, _, t=t):
                # reconstruct the copy to wait on its semaphore
                p_, q_ = divmod(t, k)
                kblk = rows_ref[jb, s]
                pltpu.make_async_copy(
                    xpd_hbm.at[
                        q_,
                        nb,
                        pl.ds(hb * R + p_ * dil, R),
                        pl.ds(0, w_),
                        pl.ds(kblk * bk, bk),
                    ],
                    xm.at[:, :, pl.ds(t * S * bk + s * bk, bk)],
                    sems.at[t],
                ).wait()
                return 0

            jax.lax.fori_loop(0, S, wait, 0)
        y_ref[:] = jax.lax.dot_general(
            xm[:].reshape(R * w_, T * S * bk),
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, R, w_, bm).astype(y_ref.dtype)

    nmb = plan.cout // bm
    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R), nmb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rows (nmb, S)
            pl.BlockSpec((1, T * S * bk, bm), lambda ij, jb: (jb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, bm),
            lambda ij, jb: (ij // (h // R), ij % (h // R), 0, jb),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((R, w_, T * S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA((T,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size) * 2
            + n * h * w_ * T * S * bk * nmb * itemsize
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.rows, plan.vals, xpd)
    return y


def cphase_sparse_conv_apply(
    x: jax.Array, plan: FusedSparseConv, rows_per_tile: int | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Phase pre-shift + ALIGNED concat + one dot — round-3, fifth cell of
    the design matrix.

    The original kernel's xmat build pays copy volume AND relayout (tap
    slices at non-8-aligned W offsets); the per-tap-dot phase variant
    removed both but split the MXU contraction (worse); the im2col variant
    moved the copies to HBM DMA (worse).  This variant keeps the single
    K=T*S*bk dot and materializes xmat with RELAYOUT-FREE copies: tap
    operands are H-slices of the dx-phase slabs (free) written into the
    im2col scratch at 128-aligned lane offsets — pure VMEM data movement,
    no sublane shuffles.  If the original kernel's unexplained ~0.3 ms is
    relayout overhead (copy-volume floor is ~0.2-0.3 ms at S=1), this
    lands ~2.3-2.7x.
    """
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = plan.rows_per_tile if rows_per_tile is None else rows_per_tile
    while R > 1 and h % R:
        R -= 1
    assert h % R == 0, (h, R)
    assert w_ % 8 == 0, (
        f"cphase_sparse_conv_apply needs w % 8 == 0 (got {w_})"
    )
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    est = (
        k * (R + 2 * pad) * w_ * S * bk * itemsize  # phase slabs (scratch)
        + R * w_ * T * S * bk * itemsize            # xmat (scratch)
        + 2 * T * S * bk * bm * itemsize            # out-block weights (2x)
        + 2 * R * w_ * bm * 4                       # f32 out tile (2x)
    )
    assert est < 12 * 2**20, (
        f"cphase sparse conv footprint ~{est/2**20:.1f} MB exceeds VMEM; "
        f"reduce rows_per_tile (R={R})"
    )
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    xpd = jnp.stack(
        [
            jax.lax.slice(
                xp, (0, 0, q * dil, 0), (n, h + 2 * pad, q * dil + w_, cin)
            )
            for q in range(k)
        ]
    )
    # tap order is hard-assumed row-major (p*dil, q*dil) via
    # divmod below; plan.taps is not consulted here

    def kernel_fn(rows_ref, vals_ref, xpd_hbm, y_ref, xg, xm, sem):
        ij = pl.program_id(0)
        jb = pl.program_id(1)
        nb = ij // (h // R)
        hb = ij % (h // R)

        for q in range(k):
            def gather(s, _, q=q):
                kblk = rows_ref[jb, s]
                cp = pltpu.make_async_copy(
                    xpd_hbm.at[
                        q,
                        nb,
                        pl.ds(hb * R, R + 2 * pad),
                        pl.ds(0, w_),
                        pl.ds(kblk * bk, bk),
                    ],
                    xg.at[q, :, :, pl.ds(s * bk, bk)],
                    sem,
                )
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, S, gather, 0)
        for t in range(T):
            p_, q_ = divmod(t, k)
            dy = p_ * dil
            # free H slice, 128-aligned lane-offset store: no relayout
            xm[:, :, pl.ds(t * S * bk, S * bk)] = xg[q_, dy : dy + R, :, :]
        y_ref[:] = jax.lax.dot_general(
            xm[:].reshape(R * w_, T * S * bk),
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, R, w_, bm).astype(y_ref.dtype)

    nmb = plan.cout // bm
    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R), nmb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T * S * bk, bm), lambda ij, jb: (jb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, bm),
            lambda ij, jb: (ij // (h // R), ij % (h // R), 0, jb),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((k, R + 2 * pad, w_, S * bk), plan.vals.dtype),
            pltpu.VMEM((R, w_, T * S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size) * 2
            + int(xpd.size) * 2
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.rows, plan.vals, xpd)
    return y


def phase_sparse_conv_apply(
    x: jax.Array, plan: SharedFusedSparseConv, rows_per_tile: int = 8,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Phase-shifted fused sparse conv — the round-3 attack on the measured
    xmat-shuffle bottleneck (docs/PERF_NOTES.md: the in-kernel tap-slice
    copies building the (R*w, T*S*bk) concat cost ~4.7 MB of VMEM shuffles
    per tile and capped the fused kernel at ~1.9x).

    Idea: a tap slice is expensive ONLY because of its W (sublane-dim)
    offset — H slices are free (untiled dim) and DMA can't express the
    non-8-aligned dx shifts.  So pre-shift the input in HBM instead: build
    the k dx-phase views  xpd[q] = xp[:, :, q*dil : q*dil + w, :]  with one
    XLA gather (HBM-bandwidth, outside the kernel), DMA one halo slab per
    (phase, support slot), and every tap (dy, dx=q*dil) becomes a FREE
    H-slice of phase slab q at W offset 0.  Per-tap dots accumulate in f32
    registers — no concat, no shuffles.

    Requires w % 8 == 0 (offset-0 extent-w slices stay sublane-aligned);
    DRN's production feature grids (1024x2048 -> 128x256) satisfy it.
    """
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = rows_per_tile
    while R > 1 and h % R:
        R -= 1
    assert h % R == 0, (h, R)
    assert w_ % 8 == 0, (
        f"phase_sparse_conv_apply needs w % 8 == 0 (got {w_}); "
        "use fused_sparse_conv_apply for odd grids"
    )
    nmb = plan.cout // bm
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    # the BlockSpec'd output tile is double-buffered by the pipeline —
    # count it twice (measured on the fused_phase sibling: an 11.6 MB
    # single-count estimate compiled to 18.6 MB and OOM'd); the weights are
    # a whole-array VMEM operand (constant index map — one copy) and the
    # phase slabs are single-buffered scratch
    est = (
        int(plan.vals.size) * itemsize            # all out-blocks' weights
        + k * (R + 2 * pad) * w_ * S * bk * itemsize  # k phase slabs
        + 2 * R * w_ * plan.cout * 4              # f32 output tile (2x)
    )
    assert est < 13 * 2**20, (
        f"phase sparse conv footprint ~{est/2**20:.1f} MB exceeds VMEM; "
        f"reduce rows_per_tile (R={R})"
    )
    # padded input: H halo pad on both sides; W right-padded so every
    # dx-phase slice (offset q*dil, extent w_) is in bounds
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    # k dx-phase views, stacked: (k, n, h+2p, w_, cin).  One XLA gather at
    # HBM bandwidth; the kernel then never touches a W offset.
    xpd = jnp.stack(
        [
            jax.lax.slice(
                xp, (0, 0, q * dil, 0), (n, h + 2 * pad, q * dil + w_, cin)
            )
            for q in range(k)
        ]
    )
    # tap order is hard-assumed row-major (p*dil, q*dil) via
    # divmod below; plan.taps is not consulted here
    rows = plan.rows

    def kernel_fn(vals_ref, xpd_hbm, y_ref, xg, sem):
        ij = pl.program_id(0)
        nb = ij // (h // R)
        hb = ij % (h // R)

        for q in range(k):  # static: phases
            for s_i, kblk in enumerate(rows):  # static: union support
                cp = pltpu.make_async_copy(
                    xpd_hbm.at[
                        q,
                        nb,
                        pl.ds(hb * R, R + 2 * pad),
                        pl.ds(0, w_),
                        pl.ds(kblk * bk, bk),
                    ],
                    xg.at[q, :, :, pl.ds(s_i * bk, bk)],
                    sem,
                )
                cp.start()
                cp.wait()
        for jb in range(nmb):
            acc = None
            for t in range(T):
                p_, q_ = divmod(t, k)
                dy = p_ * dil
                # H slice (free) of phase slab q_: the tap operand, already
                # W-aligned; reshape merges (R, w_) with w_ % 8 == 0 (free)
                sl = xg[q_, dy : dy + R, :, :].reshape(R * w_, S * bk)
                yt = jax.lax.dot_general(
                    sl,
                    vals_ref[jb, t * S * bk : (t + 1) * S * bk, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = yt if acc is None else acc + yt
            y_ref[0, :, :, jb * bm : (jb + 1) * bm] = acc.reshape(
                R, w_, bm
            ).astype(y_ref.dtype)

    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all out-blocks' weights
            pl.BlockSpec(memory_space=pltpu.HBM),   # phase views stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, plan.cout),
            lambda ij: (ij // (h // R), ij % (h // R), 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((k, R + 2 * pad, w_, S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size) * 2
            + int(xpd.size) * 2
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.vals, xpd)
    return y


def shared_concat_sparse_conv_apply(
    x: jax.Array, plan: SharedFusedSparseConv, rows_per_tile: int = 4,
    out_split: int = 2, out_dtype=jnp.float32,
) -> jax.Array:
    """Shared-union xmat + single wide dot — round-3, fourth formulation.

    The per-out-block fused kernel rebuilds its xmat (tap slices + concat,
    the measured ~0.55 ms/layer shuffle cost) for EVERY out-channel block.
    Here the xmat is built once per (spatial tile, cout/out_split group) on
    the SHARED union support and consumed by one N=cout/out_split-wide dot,
    amortizing the shuffle across out-blocks at the price of computing at
    union density (union ~0.5 vs per-block 0.125 at 87.5% on random
    masks).  Shuffle bytes per useful output drop by nmb/out_split x.
    """
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    nmb = plan.cout // bm
    assert nmb % out_split == 0, (nmb, out_split)
    gm = (nmb // out_split) * bm  # output columns per dot
    R = rows_per_tile
    while R > 1 and h % R:
        R -= 1
    assert h % R == 0, (h, R)
    wp = -(-(w_ + 2 * pad) // 8) * 8
    itemsize = jnp.dtype(plan.vals.dtype).itemsize
    est = (
        R * w_ * T * S * bk * itemsize            # xmat (scratch)
        + (R + 2 * pad) * wp * S * bk * itemsize  # halo slab (scratch)
        + 2 * T * S * bk * gm * itemsize          # weight group (2x pipeline)
        + 2 * R * w_ * gm * 4                     # f32 out tile (2x pipeline)
    )
    assert est < 12 * 2**20, (
        f"shared concat sparse conv footprint ~{est/2**20:.1f} MB exceeds "
        f"VMEM; reduce rows_per_tile (R={R}) or raise out_split"
    )
    xp = jnp.pad(
        x.astype(plan.vals.dtype),
        ((0, 0), (pad, pad), (pad, wp - w_ - pad), (0, 0)),
    )
    # weights as one (out_split, T*S*bk, gm) matrix: tap-major rows on the
    # shared union, out-blocks side by side in the columns
    vals_wide = (
        plan.vals.reshape(out_split, nmb // out_split, T * S * bk, bm)
        .transpose(0, 2, 1, 3)
        .reshape(out_split, T * S * bk, gm)
    )
    taps_np = plan.taps
    rows = plan.rows

    def kernel_fn(vals_ref, xp_hbm, y_ref, xg, xm, sem):
        ij = pl.program_id(0)
        nb = ij // (h // R)
        hb = ij % (h // R)
        jg = pl.program_id(1)

        @pl.when(jg == 0)
        def _build():
            for s_i, kblk in enumerate(rows):  # static union support
                cp = pltpu.make_async_copy(
                    xp_hbm.at[
                        nb,
                        pl.ds(hb * R, R + 2 * pad),
                        pl.ds(0, wp),
                        pl.ds(kblk * bk, bk),
                    ],
                    xg.at[:, :, pl.ds(s_i * bk, bk)],
                    sem,
                )
                cp.start()
                cp.wait()
            slab = xg[:]
            for t in range(T):
                dy, dx = int(taps_np[t, 0]), int(taps_np[t, 1])
                xm[:, :, pl.ds(t * S * bk, S * bk)] = jax.lax.slice(
                    slab, (dy, dx, 0), (dy + R, dx + w_, S * bk)
                )

        y_ref[:] = jax.lax.dot_general(
            xm[:].reshape(R * w_, T * S * bk),
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, R, w_, gm).astype(y_ref.dtype)

    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R), out_split),
        in_specs=[
            pl.BlockSpec((1, T * S * bk, gm), lambda ij, jg: (jg, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, gm),
            lambda ij, jg: (ij // (h // R), ij % (h // R), 0, jg),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, h, w_, plan.cout), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * pad, wp, S * bk), plan.vals.dtype),
            pltpu.VMEM((R, w_, T * S * bk), plan.vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * T * S * bk * plan.cout,
            bytes_accessed=int(plan.vals.size) * 2 + int(xp.size) * 2
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(vals_wide, xp)
    return y


def sparse_conv_apply(
    x: jax.Array, plan: SparseConvPlan, dilation: int = 1, bp: int = 512
) -> jax.Array:
    """Stride-1 conv with per-tap block-sparse matmuls.  x: (N, H, W, Cin),
    'same' padding = dilation * (k-1)/2 like the DRN convs."""
    n, h, w_, cin = x.shape
    k = plan.kernel
    pad = dilation * (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    P = n * h * w_
    # pad P to the kernel tile
    P_pad = -(-P // bp) * bp
    y = jnp.zeros((P_pad, plan.cout), jnp.float32)
    for p, q, wt in plan.taps:
        dy, dx = p * dilation, q * dilation
        x_tap = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w_, cin))
        flat = x_tap.reshape(P, cin)
        if P_pad != P:
            flat = jnp.pad(flat, ((0, P_pad - P), (0, 0)))
        if isinstance(wt, XwBsr):
            y = y + bsr_matmul_xw(flat, wt, bp=bp)
        else:
            y = y + jnp.dot(
                flat.astype(wt.dtype), wt, preferred_element_type=jnp.float32
            )
    return y[:P].reshape(n, h, w_, plan.cout)


# ---------------------------------------------------------------------------
# Int8 quantized fused sparse conv: prune + quantize on the same layer
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FusedSparseConvQ:
    """Int8 packing of :class:`FusedSparseConv` — the composition of the two
    compression axes (block sparsity + symmetric PTQ, tpuseg.ops.quant) in
    ONE kernel.  v5e runs int8 MXU at 2x bf16, and the kernel's secondary
    bottleneck (the in-register tap-slice copies building xmat) also halves
    in bytes, so both the compute and the copy floor drop."""

    vals: jax.Array      # (nmb, T*S*bk, bm) int8
    w_scale: jax.Array   # (nmb, 1, bm) f32 per-output-channel dequant scale
    rows: jax.Array      # (nmb, S) int32
    taps: np.ndarray
    s: int
    bk: int
    bm: int
    kernel: int
    dilation: int
    cin: int
    cout: int
    block_density: float
    rows_per_tile: int = 8
    x_scale: float | None = None  # static activation scale; None = dynamic


def quantize_fused_plan(
    plan: FusedSparseConv, x_scale: float | None = None
) -> FusedSparseConvQ:
    """Quantize a packed fused-sparse plan to int8 (per-output-channel
    weight scales over the packed value tensor)."""
    vals = np.asarray(plan.vals, np.float32)            # (nmb, TSbk, bm)
    absmax = np.abs(vals).max(axis=1, keepdims=True)    # (nmb, 1, bm)
    scale = np.maximum(absmax, 1e-8) / 127.0
    vq = np.clip(np.round(vals / scale), -127, 127).astype(np.int8)
    return FusedSparseConvQ(
        vals=jnp.asarray(vq),
        w_scale=jnp.asarray(scale.astype(np.float32)),
        rows=plan.rows,
        taps=plan.taps,
        s=plan.s,
        bk=plan.bk,
        bm=plan.bm,
        kernel=plan.kernel,
        dilation=plan.dilation,
        cin=plan.cin,
        cout=plan.cout,
        block_density=plan.block_density,
        rows_per_tile=plan.rows_per_tile,
        x_scale=x_scale,
    )


def fused_sparse_conv_apply_q(
    x: jax.Array, plan: FusedSparseConvQ, rows_per_tile: int | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Int8 variant of :func:`fused_sparse_conv_apply`: the activation is
    quantized in-graph (dynamic absmax, or ``plan.x_scale`` when
    calibrated), the kernel's dot runs int8 x int8 -> int32 on the MXU, and
    the epilogue rescales by (x_scale * per-channel w_scale).  Zero padding
    is exact under symmetric quantization (0 -> 0)."""
    n, h, w_, cin = x.shape
    k, dil = plan.kernel, plan.dilation
    pad = dil * (k - 1) // 2
    T = k * k
    S, bk, bm = plan.s, plan.bk, plan.bm
    R = plan.rows_per_tile if rows_per_tile is None else rows_per_tile
    while R > 1 and h % R:
        R -= 1  # odd feature grids: largest dividing tile height
    assert h % R == 0, (h, R)
    if plan.x_scale is None:
        # per-frame dynamic scale (reduce over HWC only): a frame's output
        # must not depend on which frames share its batch (e.g. the
        # replicated padding frames of a short final batch)
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3))
        xs = jnp.maximum(absmax, 1e-8) / 127.0          # (N,)
    else:
        xs = jnp.full((n,), plan.x_scale, jnp.float32)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / xs[:, None, None, None]),
        -127, 127,
    ).astype(jnp.int8)
    # int8 tiles are (32, 128): DMA slice extents on the W dim must be
    # 32-aligned (8-aligned for bf16; unaligned extents FAULT the worker —
    # see docs/PERF_NOTES.md dead-end #7, Mosaic fact (b))
    wp = -(-(w_ + 2 * pad) // 32) * 32
    est = (R * w_ * T * S * bk + (R + 2 * pad) * wp * S * bk)
    assert est < 12 * 2**20, (
        f"int8 fused sparse conv tile too large (~{est/2**20:.1f} MB)")
    xp = jnp.pad(xq, ((0, 0), (pad, pad), (pad, wp - w_ - pad), (0, 0)))
    taps_np = plan.taps
    xs_arr = xs.reshape(n, 1)  # per-frame scales, indexed by nb in-kernel

    def kernel_fn(rows_ref, xsc_ref, vals_ref, wsc_ref, xp_hbm, y_ref,
                  xg, sem):
        ij = pl.program_id(0)
        jb = pl.program_id(1)
        nb = ij // (h // R)
        hb = ij % (h // R)

        def gather(s, _):
            kblk = rows_ref[jb, s]
            cp = pltpu.make_async_copy(
                xp_hbm.at[
                    nb,
                    pl.ds(hb * R, R + 2 * pad),
                    pl.ds(0, wp),
                    pl.ds(kblk * bk, bk),
                ],
                xg.at[:, :, pl.ds(s * bk, bk)],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, S, gather, 0)
        slab = xg[:]
        parts = []
        for t in range(T):
            dy, dx = int(taps_np[t, 0]), int(taps_np[t, 1])
            sl = jax.lax.slice(
                slab, (dy, dx, 0), (dy + R, dx + w_, S * bk)
            ).reshape(R * w_, S * bk)
            parts.append(sl)
        xmat = jnp.concatenate(parts, axis=1)          # (R*w, T*S*bk) int8
        acc = jax.lax.dot_general(
            xmat,
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (xsc_ref[nb, 0] * wsc_ref[0, 0])
        y_ref[:] = y.reshape(1, R, w_, bm).astype(y_ref.dtype)

    nmb = plan.cout // bm
    y = _pl_call(
        kernel_fn,
        grid=(n * (h // R), nmb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # rows
            pl.BlockSpec(memory_space=pltpu.SMEM),      # per-frame x scales
            pl.BlockSpec((1, T * S * bk, bm), lambda ij, jb: (jb, 0, 0)),
            pl.BlockSpec((1, 1, bm), lambda ij, jb: (jb, 0, 0)),  # w scales
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w_, bm),
            lambda ij, jb: (ij // (h // R), ij % (h // R), 0, jb)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, plan.cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * pad, wp, S * bk), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * nmb * T * S * bk * bm,
            bytes_accessed=int(plan.vals.size)
            + int(xp.size) * nmb
            + n * h * w_ * plan.cout * 4,
            transcendentals=0,
        ),
    )(plan.rows, xs_arr, plan.vals, plan.w_scale, xp)
    return y
