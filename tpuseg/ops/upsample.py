"""Fused x8 bilinear upsample (+ argmax) for the segmentation head.

The reference upsampler is a frozen depthwise ConvTranspose2d(16, stride=8,
pad=4) with bilinear weights (semantic_seg.py:115-152).  Because stride 8
divides kernel 16 exactly, every output pixel receives contributions from at
most 2 input pixels per axis.  Decomposing by output phase r = o % 8:

    out[8m + r] = a[r] * xp[m + d(r)] + b[r] * xp[m + d(r) + 1]

with a[r] = k[(11 - r) % 8], b[r] = k[(11 - r) % 8 + 8], d(r) = (r >= 4),
and xp zero-padded by one pixel on each side.  Applied separably over H and
W this is pure VPU work (no conv at all), and the trailing argmax fuses into
the same loop under XLA — the full-resolution C-channel tensor never hits
HBM as a stored intermediate.

Verified equivalent to the conv_transpose formulation in
tests/test_ops.py::test_phase_upsample_matches_conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STRIDE = 8
KSIZE = 16


def _phase_weights(kernel_1d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-phase 2-tap weights (a[r], b[r]) for r in [0, 8).

    Transposed-conv semantics: y[8m+r] picks kernel taps k[8m+r+4-8i], so
    the two contributing taps are k[15-k0] and k[7-k0] with
    k0 = (11-r) % 8 — the flip is part of the index map (exact for
    asymmetric kernels too; tested against the conv formulation)."""
    k0 = (11 - jnp.arange(STRIDE)) % STRIDE
    a = kernel_1d[15 - k0]
    b = kernel_1d[7 - k0]
    return a, b


def _kernel_1d(up_kernel: jax.Array) -> jax.Array:
    """Extract the separable 1-D factor from the 2-D bilinear kernel.

    fill_up_weights builds k2[i,j] = f(i) * f(j), so f = sqrt(diag(k2))."""
    if up_kernel.ndim == 1:
        return up_kernel
    return jnp.sqrt(jnp.diagonal(up_kernel))


def _upsample_axis(x: jax.Array, kernel_1d: jax.Array, axis: int) -> jax.Array:
    """Upsample one spatial axis by 8 via the phase decomposition."""
    a, b = _phase_weights(kernel_1d.astype(x.dtype))
    x = jnp.moveaxis(x, axis, 1)  # (N, L, ...)
    n, L = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    pad = [(0, 0), (1, 1)] + [(0, 0)] * len(rest)
    xp = jnp.pad(x, pad)
    p0 = xp[:, 0:L]        # xp[m]
    p1 = xp[:, 1 : L + 1]  # xp[m+1]
    p2 = xp[:, 2 : L + 2]  # xp[m+2]
    shape_r = (1, 1, STRIDE // 2) + (1,) * len(rest)
    lo = p0[:, :, None] * a[:4].reshape(shape_r) + p1[:, :, None] * b[:4].reshape(shape_r)
    hi = p1[:, :, None] * a[4:].reshape(shape_r) + p2[:, :, None] * b[4:].reshape(shape_r)
    out = jnp.concatenate([lo, hi], axis=2)  # (N, L, 8, ...)
    out = out.reshape((n, L * STRIDE) + rest)
    return jnp.moveaxis(out, 1, axis)


def upsample8_phase(x: jax.Array, up_kernel: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, 8H, 8W, C), identical to the depthwise
    transposed conv with the given (16, 16) kernel."""
    k1 = _kernel_1d(up_kernel)
    x = _upsample_axis(x, k1, axis=1)
    x = _upsample_axis(x, k1, axis=2)
    return x


def upsample_argmax(seg: jax.Array, up_kernel: jax.Array) -> jax.Array:
    """argmax_c(upsample8(seg)) without storing the full-res logits.

    Monotonic log-softmax is skipped entirely — argmax of log-probs equals
    argmax of upsampled logits (the reference argmaxes log_softmax output,
    seg_video.py:163).
    """
    up = upsample8_phase(seg, up_kernel)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)


def upsample_argmax_pallas(seg: jax.Array, up_kernel: jax.Array) -> jax.Array:
    """Pallas version of ``upsample_argmax``: the full-resolution C-channel
    logits never exist — the kernel loops over classes, computes each
    class's x8 bilinear upsample in phase-major layout in VMEM, and keeps a
    running (max, argmax).

    VMEM budget for a (128, 256, 19) input: running max (64, h, w) f32 8 MB
    + int8 ids 2 MB + input ~1.3 MB.  One grid step per batch element.

    Measured on v5e at the production shape: 0.77 ms vs the XLA phase
    version's 0.66 ms — XLA's fusion already keeps the full-res logits out
    of HBM here, so the XLA path stays the production default
    (tpuseg.video uses it); this kernel documents the Pallas formulation
    and computes the interpolation in f32 (slightly more accurate argmax
    on near-ties).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = seg.shape
    # ids are tracked as int8 in VMEM to fit the budget
    assert c <= 127, f"upsample_argmax_pallas supports <= 127 classes, got {c}"
    k1 = _kernel_1d(up_kernel)
    # same flipped tap map as the XLA path — the unflipped k1[k0]/k1[k0+8]
    # only coincides for symmetric kernels (bilinear); _phase_weights is
    # exact for asymmetric ones too
    a, b = _phase_weights(k1)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    def kernel(a_ref, b_ref, seg_ref, out_ref, vmax, vids):
        # seg_ref block: (1, c, h+2, w+2) zero-padded, channels-leading so
        # the class loop can slice the (untiled) channel dim dynamically —
        # this keeps the kernel body compiled ONCE (a fully unrolled
        # classes x phases body made Mosaic compile for tens of minutes).
        # Phase values are computed and compared one (r, cph) pair at a time
        # so temporaries stay (h, w)-sized (a full phase-major f32 temp is
        # 8 MB and blows the VMEM budget together with the running max).

        def body(ch, _):
            x = seg_ref[0, ch].astype(jnp.float32)  # (h+2, w+2)
            is_first = ch == 0
            for r in range(STRIDE):
                d = 0 if r < 4 else 1
                yr = a_ref[r] * x[d : d + h, :] + b_ref[r] * x[d + 1 : d + 1 + h, :]
                for cph in range(STRIDE):
                    dc = 0 if cph < 4 else 1
                    yc = (
                        a_ref[cph] * yr[:, dc : dc + w]
                        + b_ref[cph] * yr[:, dc + 1 : dc + 1 + w]
                    )
                    better = jnp.logical_or(is_first, yc > vmax[r, cph])
                    vmax[r, cph] = jnp.where(better, yc, vmax[r, cph])
                    vids[r, cph] = jnp.where(
                        better, ch.astype(jnp.int8), vids[r, cph]
                    )
            return 0

        jax.lax.fori_loop(0, c, body, 0)
        # emit phase-major (8r, 8c, h, w); the interleaving transpose to
        # (8h, 8w) is a Mosaic-unsupported relayout — done outside in XLA
        out_ref[0] = vids[:]

    segp = jnp.pad(seg, ((0, 0), (1, 1), (1, 1), (0, 0)))
    segp = jnp.transpose(segp, (0, 3, 1, 2))  # channels-leading
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h + 2, w + 2), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, STRIDE, STRIDE, h, w), lambda i: (i, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, STRIDE, STRIDE, h, w), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((STRIDE, STRIDE, h, w), jnp.float32),
            pltpu.VMEM((STRIDE, STRIDE, h, w), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(a, b, segp)
    # (n, 8r, 8c, h, w) -> (n, h, 8r, w, 8c) -> (n, 8h, 8w)
    return (
        jnp.transpose(out, (0, 3, 1, 4, 2))
        .reshape(n, h * STRIDE, w * STRIDE)
        .astype(jnp.int32)
    )
