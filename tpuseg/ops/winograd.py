"""Fused Winograd F(2x2, 3x3) convolution for the dilated 512-channel DRN
stages (layers 5-8) — the MXU-roofline 57% of the dense frame.

Why: stages 5-8 of DRN-D-22 at 1024x2048 run 925 GF of dense 3x3 convs at
~92% MXU utilization (docs/PERF_NOTES.md) — only FLOP reduction moves them.
Winograd F(2x2, 3x3) needs 16 multiplies per 2x2 output tile vs 36 for
direct convolution (2.25x).  A pure-XLA Winograd was measured 3.6x SLOWER
than dense (PERF_NOTES dead end #3): the 16 component tensors round-trip
HBM.  This Pallas kernel keeps the input transform V, the 16 component
matmuls, and the inverse transform in VMEM — the only HBM traffic is the
input read, the output write, and one pass over the pre-transformed
weights U.

STATUS — correct but NOT routed into production (measured on v5e,
2026-08-17, PERF_NOTES dead end #7): at the DRN layer-6 shape
(512->512, d=4, 128x256, bf16) this kernel runs 3.9 ms/frame vs 1.1 ms
for XLA's dense conv; with the 16 matmuls REMOVED it still costs
2.6 ms/frame — the floor is ~20 us/grid-step of DMA-sync + block-flush +
VPU relayout (class split, phase splits, output interleave are all
sublane shuffles), times the 1024 steps the VMEM budget forces at this
size (bigger tiles with a resident 8.4 MB U do not compile).  The 2.25x
MXU FLOP cut cannot win against a dense baseline already at 92% MXU when
the surrounding data movement costs more than the entire dense conv.
Kept as a working, tested reference implementation of the technique (and
of the Mosaic constraints it uncovered: no strided slices in any
dimension — use reshape + static index; DMA destinations need 8-aligned
second-minor extents or the TPU worker faults).

Dilation: a 3x3 conv with dilation d is d^2 independent dense 3x3 convs on
the d-strided parity classes.  The kernel handles all classes of one
dilated conv in one launch: padded input rows are viewed as
(Hc+2, d, W+2d, C) — row-class r is a static index, col-class s a
reshape+static-index inside the kernel (this Mosaic toolchain rejects any
strided slice but compiles reshape+static-index; measured).

Weight transform U[k1,k2] = G w G^T is precomputed on the host (weights
are static at inference).

Reference behavior matched: the dilated 3x3 convs inside
/root/reference/drn.py BasicBlock (drn.py:32-65) at layers 5-8
(drn.py:144-163).  Numerical parity with lax.conv_general_dilated is
tested to fp32 tolerance in tests/test_winograd.py (CPU interpret mode)
and validated in bf16 on TPU by bench_winograd.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015, arXiv:1509.09308)
G = np.array([[1.0, 0.0, 0.0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0.0, 0.0, 1.0]], np.float32)
# B^T rows as (coeff, source-phase-slice) combos and A^T are applied as
# +-1 adds inline in the kernel; only G carries non-unit coefficients.
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_weights(w: np.ndarray) -> np.ndarray:
    """(3, 3, C, O) conv kernel -> U (16, C, O) with U[4*k1+k2] = the
    (k1, k2) Winograd component of G w G^T."""
    w = np.asarray(w, np.float32)
    u = np.einsum("ap,pqco,bq->abco", G, w, G)  # (4, 4, C, O)
    return np.ascontiguousarray(u.reshape(16, *w.shape[2:]))


def _row_combos(x0, x1, x2, x3):
    """B^T applied along one axis: 4 combos of the 4 phase slices."""
    return (x0 - x2, x1 + x2, x2 - x1, x1 - x3)


def _phase_slices(x, tr):
    """x (2*tr+2, L, C) -> the four stride-2 slices x[u::2][:tr] for
    u=0..3, expressed as reshape + static index (no strided slicing)."""
    xp = x.reshape(tr + 1, 2, *x.shape[1:])
    xe, xo = xp[:, 0], xp[:, 1]
    return xe[0:tr], xo[0:tr], xe[1:tr + 1], xo[1:tr + 1]


def _col_phase_slices(x, half):
    """x (TR, W', C) with W' even and >= 2*half+2 -> the four col-phase
    slices (TR, half, C); columns beyond 2*half+2 are alignment pad."""
    xp = x.reshape(x.shape[0], x.shape[1] // 2, 2, x.shape[-1])
    xe, xo = xp[:, :, 0], xp[:, :, 1]
    return (xe[:, 0:half], xo[:, 0:half],
            xe[:, 1:half + 1], xo[:, 1:half + 1])


def _winograd_kernel(x_hbm, u_ref, o_ref, xband, sem, *, d, tr, wc, c, co):
    """Grid: (co_blocks, N, d, n_bands).  One step computes output rows
    [band*2tr, band*2tr+2tr) of frame n, row-class r, all W columns (every
    col-class), co-slice co_i."""
    n = pl.program_id(1)
    r = pl.program_id(2)
    band = pl.program_id(3)

    # fetch the input row band of row-class r: x_hbm is the padded input
    # viewed (N, Hc+2, d, W+2d, C); class-r rows are a static index
    copy = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(band * 2 * tr, 2 * tr + 2), r], xband, sem)
    copy.start()
    copy.wait()

    xb = xband[:]  # (2tr+2, d*wpad, C) — wpad >= wc+2, 8-lane-aligned rows
    half = wc // 2
    t = tr * half
    ys = []  # per col-class s: [y00, y01, y10, y11], each (t, co) f32
    for s in range(d):
        # col-class s via reshape + static index
        xc = xb.reshape(2 * tr + 2, (xb.shape[1]) // d, d, c)[:, :, s, :]
        # (any right-pad columns beyond wc+2 are ignored by the slices)
        # row transform (B^T along H)
        r0, r1, r2, r3 = _row_combos(*_phase_slices(xc, tr))
        acc = [jnp.zeros((t, co), jnp.float32) for _ in range(4)]
        for k1, rk in enumerate((r0, r1, r2, r3)):
            # col transform (B^T along W) of this row-combo
            c0, c1, c2, c3 = _col_phase_slices(rk, half)
            for k2, vk in enumerate(_row_combos(c0, c1, c2, c3)):
                m = jax.lax.dot_general(
                    vk.reshape(t, c), u_ref[4 * k1 + k2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # inverse transform A^T (.) A: +-1 accumulation
                for p1 in range(2):
                    a1 = AT[p1, k1]
                    if a1 == 0:
                        continue
                    for p2 in range(2):
                        a2 = AT[p2, k2]
                        if a2 == 0:
                            continue
                        idx = 2 * p1 + p2
                        acc[idx] = (acc[idx] + m if a1 * a2 > 0
                                    else acc[idx] - m)
        ys.append(acc)

    # assemble (2tr, W, co): cols are (m, p2, s) interleaved, rows (i, p1)
    dt = o_ref.dtype
    rows = []
    for p1 in range(2):
        # (tr, half, 2, d, co): stack p2 then s
        cols = jnp.stack([
            jnp.stack([ys[s][2 * p1 + p2].reshape(tr, half, co)
                       for s in range(d)], axis=2)  # (tr, half, d, co)
            for p2 in range(2)
        ], axis=2)  # (tr, half, 2, d, co)
        rows.append(cols.reshape(tr, half * 2 * d, co))
    out = jnp.stack(rows, axis=1).reshape(2 * tr, half * 2 * d, co)
    o_ref[0, :, 0] = out.astype(dt)


@functools.partial(jax.jit, static_argnames=("dilation", "tr", "co_blocks",
                                             "interpret"))
def winograd_conv(x: jax.Array, u: jax.Array, *, dilation: int = 1,
                  tr: int = 4, co_blocks: int = 1,
                  interpret: bool = False) -> jax.Array:
    """'Same'-padded 3x3 conv with the given dilation, computed as fused
    Winograd F(2x2, 3x3) over the d^2 parity classes.

    x: (H, W, C) (single frame) or (N, H, W, C); u: (16, C, O) from
    ``transform_weights``.  H/d and W/d must be even.  ``tr`` = Winograd
    tile-rows per kernel step; ``co_blocks`` splits the output channels to
    bound VMEM (use 2 for 512->512 layers).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    d = dilation
    co = u.shape[2]
    hc, wc = h // d, w // d
    assert hc % 2 == 0 and wc % 2 == 0, (h, w, d)
    assert (hc // 2) % tr == 0, (hc, tr)
    assert co % co_blocks == 0
    n_bands = hc // (2 * tr)
    co_blk = co // co_blocks

    # DMA destinations must have 8-aligned sublane (second-minor) extents —
    # an unaligned copy FAULTS the TPU worker (bisected on v5e; cols=34
    # crashes, cols=40 works).  Pad each col-class width wc+2 up by a
    # minimal even `extra` so the full interleaved row d*(wc+2+extra) is a
    # multiple of 8.  Class columns are j-major in the physical layout
    # (col = d*j + s), so per-class right-pad is a plain right-pad of the
    # physical tensor; the kernel's [0:half]/[1:half+1] slices ignore it.
    wpad = wc + 2
    while (d * wpad) % 8:
        wpad += 2
    extra = wpad - (wc + 2)
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d + d * extra), (0, 0)))
    # rows of class r live at d*i + r: the padded tensor viewed
    # (Hc+2, d, d*wpad, C) puts the row-class index in a static dim
    xp = xp.reshape(n, hc + 2, d, d * wpad, c)

    kernel = functools.partial(
        _winograd_kernel, d=d, tr=tr, wc=wc, c=c, co=co_blk)
    # co outermost so the U block stays resident across nearly all steps
    grid = (co_blocks, n, d, n_bands)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hc, d, w, co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x: manual DMA
            pl.BlockSpec((16, c, co_blk), lambda i, nn, r, b: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * tr, 1, w, co_blk), lambda i, nn, r, b: (nn, b, r, 0, i),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * tr + 2, d * wpad, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, u.astype(x.dtype))
    # (N, Hc, d, W, O) -> (N, H, W, O): undo the row-class view (reshape)
    out = out.reshape(n, h, w, co)
    return out[0] if squeeze else out
