"""DRNSeg: DRN backbone + 1x1 seg head + frozen bilinear x8 upsampler.

Behavioral reference: /root/reference/semantic_seg.py:115-164 (``fill_up_weights``
and ``DRNSeg``).  The reference upsampler is a depthwise
``ConvTranspose2d(classes, classes, 16, stride=8, padding=4, groups=classes)``
with frozen bilinear weights.  Here it is expressed as an input-dilated
depthwise convolution (mathematically identical), which XLA lowers well.  The
production inference path uses the phase-decomposed XLA upsample+argmax
(tpuseg.ops.upsample.upsample_argmax) — measured faster than the Pallas
variant (0.66 vs 0.77 ms; see ops/upsample.py) — so the full-resolution
19-channel logit tensor never round-trips HBM.

Forward returns ``(log_softmax(upsample(seg_logits)), seg_logits)`` exactly
like the reference (semantic_seg.py:154-158).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.drn import (
    DrnSpec,
    Params,
    State,
    build_drn_spec,
    conv2d,
    drn_forward,
    init_drn,
)

UP_KERNEL = 16
UP_STRIDE = 8
UP_PAD = 4


def bilinear_upsample_kernel(k: int = UP_KERNEL) -> np.ndarray:
    """The fixed bilinear kernel of the reference ``fill_up_weights``
    (semantic_seg.py:115-124).  Returns (k, k) float32."""
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return w


def build_drnseg_spec(arch: str, classes: int) -> DrnSpec:
    """Backbone spec with DRNSeg ('layer.') naming and no classifier head."""
    return build_drn_spec(arch, num_classes=0, naming="seg")


def init_drnseg(key, arch: str, classes: int) -> tuple[Params, State, DrnSpec]:
    from tpuseg.models.drn import rng_from_key

    spec = build_drnseg_spec(arch, classes)
    params, state = init_drn(key, spec)
    rng = rng_from_key(key)
    rng = np.random.default_rng(rng.integers(0, 2**63 - 1, 2))  # head stream
    # 1x1 seg head, He init with n = kh*kw*cout (semantic_seg.py:140-143)
    std = math.sqrt(2.0 / classes)
    params["seg.weight"] = (
        std * rng.standard_normal((1, 1, spec.out_dim, classes))
    ).astype(np.float32)
    params["seg.bias"] = np.zeros((classes,), np.float32)
    # Frozen depthwise transposed-conv weights, stored (k, k) — identical for
    # every channel (fill_up_weights copies channel 0 everywhere).
    params["up.weight"] = bilinear_upsample_kernel()
    return params, state, spec


def upsample8(x: jax.Array, up_kernel: jax.Array, compute_dtype: Any = None) -> jax.Array:
    """Depthwise transposed conv, stride 8, kernel 16, pad 4 — as an
    input-dilated conv: out = conv(dilate_8(x), flip(k), pad=k-1-4=11).

    The bilinear kernel is symmetric so the flip is a no-op, but we keep it
    for correctness with arbitrary kernels.  Output is exactly 8x the input
    spatial dims, matching ConvTranspose2d output sizing.
    """
    c = x.shape[-1]
    k = up_kernel.shape[-1]
    w = jnp.flip(up_kernel, axis=(0, 1)) if up_kernel.ndim == 2 else up_kernel
    w = w.reshape(k, k, 1, 1) * jnp.ones((1, 1, 1, c), up_kernel.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pad = k - 1 - UP_PAD
    # preferred_element_type must match the operand dtype here: with a widened
    # accumulator the conv VJP builds a conv mixing the f32 cotangent with
    # bf16 operands and fails to trace.  Bilinear interpolation sums at most
    # 2x2 terms with weights < 1, so accumulation in the compute dtype is
    # exact enough; the log-softmax above upcasts to f32 anyway.
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(UP_STRIDE, UP_STRIDE),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def drnseg_forward(
    params: Params,
    state: State,
    x: jax.Array,
    spec: DrnSpec,
    *,
    train: bool = False,
    compute_dtype: Any = None,
    upsample: bool = True,
    stem_fn=None,
    stem_stages: int = 1,
    sparse_plans=None,
    remat: bool = False,
) -> tuple[jax.Array, jax.Array, State]:
    """Full DRNSeg forward.

    Returns ``(log_probs, seg_logits, bn_updates)`` where ``log_probs`` is the
    log-softmax of the x8-upsampled logits (NHWC), mirroring the reference
    forward (semantic_seg.py:154-158).  With ``upsample=False`` the first
    element is the log-softmax at feature resolution (for fused inference
    paths that upsample+argmax in one kernel).
    """
    feats, _, updates = drn_forward(
        params, state, x, spec, train=train, compute_dtype=compute_dtype,
        stem_fn=stem_fn, stem_stages=stem_stages, sparse_plans=sparse_plans,
        remat=remat,
    )
    seg = conv2d(feats, params["seg.weight"], compute_dtype=compute_dtype)
    seg = seg + params["seg.bias"].astype(seg.dtype)
    if upsample:
        y = upsample8(seg, params["up.weight"], compute_dtype=compute_dtype)
        logp = jax.nn.log_softmax(y.astype(jnp.float32), axis=-1)
    else:
        logp = jax.nn.log_softmax(seg.astype(jnp.float32), axis=-1)
    return logp, seg, updates
