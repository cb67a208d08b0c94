"""Block-sparse conv TRAINING: custom VJP so high-sparsity layers train at
reduced wall-clock cost, not just simulated masking.

The reference trains sparsity by multiplying dense weights with 0/1 masks
after every optimizer step (/root/reference/pruners/Pruner.py:17-20,
semantic_seg.py:213-214) — every conv still runs dense.  Here all three
passes of an eligible masked conv execute at the mask's union block
density:

- forward: the fused block-sparse Pallas kernel
  (tpuseg.ops.sparse_conv.fused_sparse_conv_apply) on weights packed from
  the live parameter tensor each step (packing is a static gather, so its
  autodiff VJP scatters gradients back to the dense weight tensor).
- dgrad (dx): a stride-1 'same' conv with spatially flipped taps and
  transposed channel blocks — ALSO block-sparse with the transposed
  support, executed by the same kernel on statically re-indexed packed
  values.
- wgrad (dvals): per-tap batched matmuls restricted to the support blocks,
  K = all pixels (MXU-friendly), at union density.

Gradient parity with the dense-masked step is exact up to float
associativity (tests/test_sparse_train.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tpuseg.ops.sparse_conv import FusedSparseConv, fused_sparse_conv_apply


@dataclasses.dataclass(frozen=True)
class SparseTrainStruct:
    """Static (trace-time) structure of a trainable block-sparse conv.

    All members are host numpy / python ints so the struct can be closed
    over by a jitted train step without becoming a traced value.
    """

    rows: np.ndarray       # (nmb, S) K-block index per fwd gather slot
    nzsel: np.ndarray      # (nmb, T, S) 0/1: tap t has a block at slot s
    rows_t: np.ndarray     # (nkb, St) M-block index per bwd gather slot
    gather_t: np.ndarray   # (nkb, T, St) flat index into fwd vals (+sentinel)
    kernel: int
    dilation: int
    bk: int
    bm: int
    cin: int
    cout: int
    s: int
    st: int
    rows_per_tile: int
    block_density: float

    @property
    def taps(self) -> np.ndarray:
        k, d = self.kernel, self.dilation
        return np.array([(p * d, q * d) for p in range(k) for q in range(k)],
                        np.int32)


def plan_sparse_conv_train(
    mask_hwio: np.ndarray,
    dilation: int = 1,
    bk: int = 128,
    bm: int = 128,
    rows_per_tile: int = 8,
) -> SparseTrainStruct:
    """Derive the static packing structure from a mask (weights-free)."""
    kh, kw, cin, cout = mask_hwio.shape
    assert kh == kw
    assert cin % bk == 0 and cout % bm == 0
    nkb, nmb = cin // bk, cout // bm
    T = kh * kw
    m = np.asarray(mask_hwio) != 0
    nz = np.zeros((nmb, T, nkb), bool)
    for t in range(T):
        p, q = divmod(t, kw)
        blocks = m[p, q].reshape(nkb, bk, nmb, bm)
        nz[:, t, :] = blocks.any(axis=(1, 3)).T
    union = nz.any(axis=1)            # (nmb, nkb)
    union_t = union.T                 # (nkb, nmb)
    S = max(int(union.sum(axis=1).max()), 1)
    St = max(int(union_t.sum(axis=1).max()), 1)

    rows = np.zeros((nmb, S), np.int32)
    slot_of = -np.ones((nmb, nkb), np.int64)  # k-block -> fwd slot
    for j in range(nmb):
        ks = np.flatnonzero(union[j])
        rows[j, : len(ks)] = ks
        slot_of[j, ks] = np.arange(len(ks))

    nzsel = np.zeros((nmb, T, S), np.float32)
    for j in range(nmb):
        for s_i, k in enumerate(np.flatnonzero(union[j])):
            nzsel[j, :, s_i] = nz[j, :, k]

    # transposed structure: dgrad conv over (cout -> cin) with flipped taps.
    # valsT[jp, tp, sp] = vals[kp, T-1-tp, slot_of[kp, jp]]^T with
    # kp = rows_t[jp, sp]; padded slots point at an appended zero block.
    rows_t = np.zeros((nkb, St), np.int32)
    sentinel = nmb * T * S  # index of the appended zero block
    gather_t = np.full((nkb, T, St), sentinel, np.int64)
    for jp in range(nkb):
        ms = np.flatnonzero(union_t[jp])
        rows_t[jp, : len(ms)] = ms
        for sp, kp in enumerate(ms):
            si = slot_of[kp, jp]
            assert si >= 0
            for tp in range(T):
                gather_t[jp, tp, sp] = (kp * T + (T - 1 - tp)) * S + si

    return SparseTrainStruct(
        rows=rows, nzsel=nzsel, rows_t=rows_t, gather_t=gather_t,
        kernel=kh, dilation=dilation, bk=bk, bm=bm, cin=cin, cout=cout,
        s=S, st=St, rows_per_tile=rows_per_tile,
        block_density=float(union.mean()),
    )


def pack_vals(w_hwio: jax.Array, st: SparseTrainStruct,
              dtype=jnp.bfloat16) -> jax.Array:
    """Differentiable packing: dense HWIO weights -> (nmb, T*S*bk, bm).

    Static 2-D slices + concat + structural zeroing; the autodiff VJP
    scatters value gradients back onto the dense weight tensor (zero
    off-support).

    Construction constraints, both MEASURED on v5e:
    - st.rows is host numpy and indexed with PYTHON ints so XLA sees pure
      static slices (an elementwise take_along_axis compiled to a generic
      gather whose VJP scatter cost ~13 ms/step — 4x the whole sparse
      fwd+bwd).
    - the result must be built WITHOUT any >=3-D transpose: a
      reshape(T,nkb,bk,nmb,bm).transpose(3,0,1,2,4) spelling made XLA
      assign the Mosaic kernel's vals operand a non-default layout under
      jit, which the custom call silently misreads — eager and interpret
      paths were exact while the jitted train step produced garbage for
      support patterns like rows=[1,0] (round-5 chip bisection,
      docs/PERF_NOTES.md "Mosaic operand layout").  Slice+concat of 2-D
      blocks keeps every intermediate in default layout by construction.
    """
    kh = st.kernel
    T = kh * kh
    nmb = st.cout // st.bm
    w2 = w_hwio.reshape(T, st.cin, st.cout)
    zero = None
    blocks = []
    for j in range(nmb):
        rows_j = []
        for t in range(T):
            for s in range(st.s):
                if float(st.nzsel[j, t, s]) == 0.0:
                    if zero is None:
                        zero = jnp.zeros((st.bk, st.bm), w2.dtype)
                    rows_j.append(zero)
                    continue
                k = int(st.rows[j, s])
                rows_j.append(
                    w2[t, k * st.bk:(k + 1) * st.bk,
                       j * st.bm:(j + 1) * st.bm]
                )
        blocks.append(jnp.concatenate(rows_j, axis=0))
    return jnp.stack(blocks).astype(dtype)


def _fwd_plan(vals: jax.Array, st: SparseTrainStruct) -> FusedSparseConv:
    return FusedSparseConv(
        vals=vals, rows=jnp.asarray(st.rows), taps=st.taps, s=st.s,
        bk=st.bk, bm=st.bm, kernel=st.kernel, dilation=st.dilation,
        cin=st.cin, cout=st.cout, block_density=st.block_density,
        rows_per_tile=st.rows_per_tile,
    )


def _transpose_vals(vals: jax.Array, st: SparseTrainStruct) -> jax.Array:
    """Statically re-index fwd packed vals into the dgrad (transposed)
    packing.

    Same two construction constraints as pack_vals: static slices only
    (gather_t is host numpy; the sentinel selects the zero block), and NO
    >=3-D transpose on the path to the Mosaic kernel operand — each block
    is transposed as a 2-D slice and the result assembled by concat+stack
    (see pack_vals's layout note)."""
    T = st.kernel * st.kernel
    nmb = st.cout // st.bm
    nkb = st.cin // st.bk
    n_src = nmb * T * st.s
    zero = jnp.zeros((st.bm, st.bk), vals.dtype)
    blocks = []
    for g in st.gather_t.reshape(-1):
        gi = int(g)
        if gi < n_src:
            kp, rem = divmod(gi, T * st.s)
            sl = vals[kp, rem * st.bk:(rem + 1) * st.bk, :]  # (bk, bm)
            blocks.append(sl.T)
        else:
            blocks.append(zero)
    per = T * st.st
    rows = [jnp.concatenate(blocks[i * per:(i + 1) * per], axis=0)
            for i in range(nkb)]
    return jnp.stack(rows)                     # (nkb, T*St*bm, bk)


def _bwd_plan(vals_t: jax.Array, st: SparseTrainStruct) -> FusedSparseConv:
    return FusedSparseConv(
        vals=vals_t, rows=jnp.asarray(st.rows_t), taps=st.taps, s=st.st,
        bk=st.bm, bm=st.bk, kernel=st.kernel, dilation=st.dilation,
        cin=st.cout, cout=st.cin, block_density=st.block_density,
        rows_per_tile=st.rows_per_tile,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sparse_conv_vals(x: jax.Array, vals: jax.Array,
                     st: SparseTrainStruct) -> jax.Array:
    """Differentiable fused block-sparse conv on packed values."""
    return fused_sparse_conv_apply(x, _fwd_plan(vals, st))


def _sc_fwd(x, vals, st):
    y = fused_sparse_conv_apply(x, _fwd_plan(vals, st))
    return y, (x, vals)


def _sc_bwd(st, res, dy):
    x, vals = res
    T = st.kernel * st.kernel
    nmb = st.cout // st.bm
    dyc = dy.astype(vals.dtype)

    # dgrad: transposed-support sparse conv of dy
    dx = fused_sparse_conv_apply(dyc, _bwd_plan(_transpose_vals(vals, st), st))
    dx = dx.astype(x.dtype)

    # wgrad at union density: per-tap batched matmuls over support blocks
    n, h, w_, _ = x.shape
    pad = st.dilation * (st.kernel - 1) // 2
    xp = jnp.pad(x.astype(vals.dtype),
                 ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # gather support channels once: (n, h+2p, w+2p, nmb*S*bk) — static
    # contiguous channel slices (st.rows is host numpy), not a gather
    xg = jnp.concatenate([
        xp[..., int(r) * st.bk:(int(r) + 1) * st.bk]
        for r in st.rows.reshape(-1)
    ], axis=-1)
    dyr = dyc.reshape(n, h, w_, nmb, st.bm)
    parts = []
    for t in range(T):
        ty, tx = int(st.taps[t, 0]), int(st.taps[t, 1])
        xs = jax.lax.slice(
            xg, (0, ty, tx, 0), (n, ty + h, tx + w_, xg.shape[3])
        ).reshape(n, h, w_, nmb, st.s, st.bk)
        d_t = jnp.einsum("nhwjsk,nhwjm->jskm", xs, dyr,
                         preferred_element_type=jnp.float32)
        parts.append(d_t)
    dvals = jnp.stack(parts, axis=1)                    # (nmb, T, S, bk, bm)
    dvals = dvals * jnp.asarray(st.nzsel)[:, :, :, None, None]
    dvals = dvals.reshape(nmb, T * st.s * st.bk, st.bm).astype(vals.dtype)
    return dx, dvals


sparse_conv_vals.defvjp(_sc_fwd, _sc_bwd)


def sparse_conv_train(x: jax.Array, w_hwio: jax.Array,
                      st: SparseTrainStruct,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Trainable block-sparse conv: pack live weights, run the fused kernel,
    with sparse dgrad/wgrad.  Output is f32 (like the inference kernel)."""
    vals = pack_vals(w_hwio, st, dtype=compute_dtype)
    return sparse_conv_vals(x.astype(compute_dtype), vals, st)


def build_sparse_train_structs(
    masks, spec, dense_threshold: float = 0.75, rows_per_tile: int = 8,
) -> tuple[dict, dict]:
    """{conv_name: SparseTrainStruct} for every eligible masked conv
    (same eligibility as inference: stride 1, channels /128, coarse mask)."""
    convs = {}
    for _, stage in spec.stages:
        if stage.kind == "convs":
            for cdef, _bn in stage.convs:
                convs[cdef.name] = cdef
        else:
            for blk in stage.blocks:
                for cdef in blk.convs:
                    convs[cdef.name] = cdef
                if blk.downsample is not None:
                    convs[blk.downsample[0].name] = blk.downsample[0]

    structs: dict = {}
    report: dict = {}
    for mask_name, mask in masks.items():
        if not mask_name.endswith(".weight"):
            continue
        cname = mask_name[: -len(".weight")]
        cdef = convs.get(cname)
        if cdef is None:
            continue
        if cdef.stride != 1:
            report[cname] = "dense: stride != 1"
            continue
        if cdef.cin % 128 or cdef.cout % 128:
            report[cname] = f"dense: channels {cdef.cin}x{cdef.cout} not /128"
            continue
        st = plan_sparse_conv_train(
            np.asarray(mask, np.float32), dilation=cdef.dilation,
            rows_per_tile=rows_per_tile,
        )
        if st.block_density >= dense_threshold:
            report[cname] = f"dense: union block density {st.block_density:.2f}"
            continue
        structs[cname] = st
        report[cname] = f"sparse-train: union density {st.block_density:.2f}"
    return structs, report
