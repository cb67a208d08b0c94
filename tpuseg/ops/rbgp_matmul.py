"""RBGP structured-mask lowering: exploit the Kronecker/periodic structure of
SRMBRep masks (the framework's namesake sparsity) for real execution wins.

Background (reference: /root/reference/pruners/SRMBRepMasker.py:337-383): an
SRMBRep mask over the collapsed (cout x cin*k*k) weight matrix is
``OB (x) (CB (x) P) (x) IB``; with ``is_repetitive=True`` (every shipped
config) and ``osp=0`` the whole mask is the inner pattern ``P`` tiled
periodically: ``mask[r, c] = P[(r//ibh) % ph, (c//ibw') % pw]``.  The mask is
therefore fully described by a small pattern ``P`` plus a period — structure
this module detects directly from the mask and routes to the best lowering
for a 128x128-systolic-array (MXU) target:

- ``column_compact``: P has all-zero columns whose span (``IB`` width
  ``ibw*k*k``) covers whole input channels for every tap (COLUMN/CCOLUMN
  inner patterns).  Dead input channels are sliced away and the conv runs
  dense at reduced K — a true wall-clock win with zero gather cost.
- ``grouped_conv``: P is block-diagonal (GROUP pattern) at whole-channel
  granularity -> ``feature_group_count`` grouped conv, FLOPs / num_groups.
- ``dense``: everything else, including the shipped RAMANUJAN patterns.

Why dense for RAMANUJAN (measured on a real v5e, 2026-08-16): the
residue-permuted grouped-matmul lowering — output channels grouped by
residue class, each group contracting only its 50% column support, which is
the strongest gather-free formulation ``is_repetitive`` admits — runs at
~2.0 TFLOP/s in both orientations (batched einsum (32,P,2304)@(32,2304,16)
and its transpose), vs ~30 TFLOP/s for the equivalent dense matmul: the
group output width (cout/ph = 16 channels) wastes 7/8 of the MXU's 128
lanes, so skipping 50% of FLOPs costs 8x in efficiency.  A Ramanujan
pattern is an expander by construction — maximally resistant to the
clustering/permutation that would produce MXU-sized dense blocks (that
spectral gap is the paper's whole point), so no permutation fixes this.
Dense-with-mask IS the optimal MXU execution for those layers; the
structured patterns above are where RBGP structure pays off on TPU.

A residue-grouped einsum lowering (``grouped_einsum_apply``) was built,
tested, and measured at that 8x loss; it was deleted in round 5 — the
measurement lives in docs/PERF_NOTES.md's dead-end list, which is the
artifact worth keeping.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Structure detection
# --------------------------------------------------------------------------


def _min_period(arr: np.ndarray, axis: int) -> int:
    """Smallest divisor p of arr.shape[axis] such that arr is p-periodic."""
    n = arr.shape[axis]
    m = np.moveaxis(arr, axis, 0).reshape(n, -1)
    for p in sorted(d for d in range(1, n + 1) if n % d == 0):
        tiles = m.reshape(n // p, p, -1)
        if (tiles == tiles[:1]).all():
            return p
    return n


@dataclasses.dataclass(frozen=True)
class RbgpStructure:
    """Periodic structure of a collapsed mask: mask = tile(P)."""

    pattern: np.ndarray  # (pr, pc) 0/1
    pr: int              # row period (output channels)
    pc: int              # column period (collapsed input columns)
    row_degree: int      # nonzero columns per pattern row
    density: float


def detect_structure(mask_oik: np.ndarray) -> RbgpStructure | None:
    """Detect the periodic (is_repetitive) structure of a collapsed mask.

    ``mask_oik``: (cout, cin*k*k) 0/1 in torch collapse order (column index
    = cin_index * k*k + tap_index), the layout SRMBRep masks are built in.
    Returns None when the mask has no non-trivial periodicity.
    """
    m = np.asarray(mask_oik)
    if m.ndim != 2 or not m.size:
        return None
    mb = (m != 0).astype(np.int8)
    pr = _min_period(mb, 0)
    pc = _min_period(mb, 1)
    if pr == mb.shape[0] and pc == mb.shape[1]:
        return None  # aperiodic
    P = mb[:pr, :pc].astype(np.float32)
    return RbgpStructure(
        pattern=P, pr=pr, pc=pc,
        row_degree=int(P.sum(1).max()),
        density=float(P.mean()),
    )


# --------------------------------------------------------------------------
# Lowering plans
# --------------------------------------------------------------------------


@dataclasses.dataclass
class RbgpPlan:
    kind: str            # dense | column_compact | tap_compact | grouped_conv
    note: str
    live_in: np.ndarray | None = None   # column_compact: input channel idx
    weights: jax.Array | None = None    # packed weights (HWIO)
    groups: int = 1                     # grouped_conv
    perm_in: np.ndarray | None = None   # grouped_conv: residue-class gather
    perm_out: np.ndarray | None = None  # grouped_conv: output scatter
    taps: list | None = None            # tap_compact: [(dy, dx, live_idx)]


def _collapse_hwio(mask_hwio: np.ndarray) -> np.ndarray:
    """HWIO mask -> torch-collapsed (cout, cin*k*k) 0/1 matrix."""
    kh, kw, cin, cout = mask_hwio.shape
    return (
        np.transpose(mask_hwio, (3, 2, 0, 1)).reshape(cout, cin * kh * kw) != 0
    ).astype(np.float32)


def plan_rbgp(
    w_hwio: np.ndarray,
    mask_hwio: np.ndarray,
    dtype=jnp.bfloat16,
    min_savings: float = 0.10,
) -> RbgpPlan:
    """Choose the best MXU lowering for a structured mask.

    Returns an ``RbgpPlan``; ``kind='dense'`` means "execute the masked conv
    on the standard dense path" (optimal for expander patterns — see module
    docstring for the v5e measurements behind this).
    """
    w = np.asarray(w_hwio, np.float32) * np.asarray(mask_hwio, np.float32)
    kh, kw, cin, cout = w.shape

    # 1) dead input channels across ALL taps (COLUMN-family patterns with
    #    channel-aligned IB): channel i is dead iff every tap masks it.
    ch_alive = (np.abs(mask_hwio).sum(axis=(0, 1, 3)) != 0)
    n_live = int(ch_alive.sum())
    if 0 < n_live <= cin * (1.0 - min_savings):
        live = np.nonzero(ch_alive)[0].astype(np.int32)
        return RbgpPlan(
            kind="column_compact",
            note=f"dead input channels: {cin - n_live}/{cin}",
            live_in=live,
            weights=jnp.asarray(w[:, :, live, :], dtype),
        )

    # 2) per-tap dead channels (COLUMN patterns under collapse_tensor=True:
    #    the collapsed column index interleaves channel and tap, so each tap
    #    kills a different subset of the channels).  Lower to a sum of
    #    shifted compact 1x1 matmuls — FLOPs drop to the per-tap live
    #    fraction.
    tap_alive = np.abs(mask_hwio).sum(axis=3) != 0  # (kh, kw, cin)
    worst_live = tap_alive.reshape(kh * kw, cin).sum(1).max() / cin
    if 0 < worst_live <= 1.0 - min_savings and (kh, kw) != (1, 1):
        taps = []
        wpack = []
        for dy in range(kh):
            for dx in range(kw):
                live = np.nonzero(tap_alive[dy, dx])[0].astype(np.int32)
                taps.append((dy, dx, live))
                wpack.append(jnp.asarray(w[dy, dx][live, :], dtype))
        return RbgpPlan(
            kind="tap_compact",
            note=f"per-tap live fraction {worst_live:.2f}",
            weights=wpack,
            taps=taps,
        )

    # 3) block-diagonal up to the residue-class permutation (GROUP pattern):
    #    detect on the periodic structure of the (cout x cin) support.
    support = np.abs(mask_hwio).sum(axis=(0, 1)) != 0  # (cin, cout)
    sdet = detect_structure(support.T.astype(np.float32))
    if sdet is not None:
        P = sdet.pattern  # (pr over cout, pc over cin)
        pr, pc = sdet.pr, sdet.pc
        g = _blockdiag_groups(P)
        if g is not None and g > 1 and cin % pc == 0 and cout % pr == 0:
            sh, sw = pr // g, pc // g
            # class-major channel orders: block id of input channel i is
            # (i % pc) // sw; of output channel o is (o % pr) // sh
            ib = (np.arange(cin) % pc) // sw
            ob = (np.arange(cout) % pr) // sh
            perm_in = np.argsort(ib, kind="stable").astype(np.int32)
            perm_out_fwd = np.argsort(ob, kind="stable").astype(np.int32)
            perm_out = np.argsort(perm_out_fwd).astype(np.int32)  # inverse
            wp = w[:, :, perm_in][:, :, :, perm_out_fwd]
            bi, bo = cin // g, cout // g
            wg = np.concatenate(
                [wp[:, :, i * bi:(i + 1) * bi, i * bo:(i + 1) * bo]
                 for i in range(g)], axis=3)
            return RbgpPlan(
                kind="grouped_conv",
                note=f"block-diagonal after residue permutation, {g} groups",
                weights=jnp.asarray(wg, dtype),
                groups=g,
                perm_in=perm_in,
                perm_out=perm_out,
            )

    s = detect_structure(_collapse_hwio(mask_hwio))
    if s is not None:
        return RbgpPlan(
            kind="dense",
            note=(f"periodic P {s.pr}x{s.pc} density {s.density:.2f}: "
                  "expander pattern -> dense is MXU-optimal (measured; "
                  "see module docstring)"),
        )
    return RbgpPlan(kind="dense", note="no exploitable structure")


def _blockdiag_groups(P: np.ndarray) -> int | None:
    """Largest G > 1 such that P is block-diagonal with G equal blocks."""
    pr, pc = P.shape
    for g in range(min(pr, pc), 1, -1):
        if pr % g or pc % g:
            continue
        sh, sw = pr // g, pc // g
        blocks = P.reshape(g, sh, g, sw)
        off = blocks.sum() - sum(blocks[i, :, i, :].sum() for i in range(g))
        if off == 0:
            return g
    return None


def rbgp_conv_apply(
    x: jax.Array, plan: RbgpPlan, stride: int = 1, dilation: int = 1,
    padding: int | None = None,
) -> jax.Array:
    """Execute a compact/grouped plan on NHWC input (stride-1 'same' for
    tap_compact)."""
    from tpuseg.models.drn import conv2d

    if plan.kind == "tap_compact":
        assert stride == 1, "tap_compact lowers stride-1 convs"
        kh = max(dy for dy, _, _ in plan.taps) + 1
        pad = dilation * (kh - 1) // 2 if padding is None else padding
        n, h, w_, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = None
        for (dy, dx, live), wt in zip(plan.taps, plan.weights):
            sh = jax.lax.dynamic_slice(
                xp, (0, dy * dilation, dx * dilation, 0), (n, h, w_, xp.shape[3])
            )[..., np.asarray(live)]
            y = jnp.einsum("nhwc,cm->nhwm", sh, wt.astype(sh.dtype),
                           preferred_element_type=jnp.float32)
            out = y if out is None else out + y
        return out.astype(x.dtype)

    w = plan.weights
    assert w is not None, "dense plans execute on the standard path"
    w = w.astype(x.dtype)
    if padding is None:
        padding = dilation * (w.shape[0] - 1) // 2
    if plan.kind == "column_compact":
        return conv2d(x[..., np.asarray(plan.live_in)], w, stride, dilation,
                      padding)
    if plan.kind == "grouped_conv":
        y = conv2d(x[..., np.asarray(plan.perm_in)], w, stride, dilation,
                   padding, groups=plan.groups)
        return y[..., np.asarray(plan.perm_out)]
    raise ValueError(plan.kind)

