"""Int8 post-training quantization for DRNSeg serving — the TPU-native
compression axis the reference leaves on the table.

The reference framework compresses by pruning (RBGP masks) and KD; its
deployment story stops at fp32 CUDA kernels.  On TPU v5e the MXU runs
int8 at 2x the bf16 rate, and the dense dilated stages 5-8 of DRN-D-22
sit at the bf16 MXU roofline (92% utilization — docs/PERF_NOTES.md), so
int8 is the only dense lever left: the layer-6 conv shape measured
0.628 ms/frame int8 vs 1.070 ms bf16 (1.70x, chained-scan timing).

Scheme (standard symmetric PTQ):
- weights: per-output-channel absmax scales, quantized once at plan build
  (int8, zero-point 0);
- activations: per-tensor scale, either dynamic (in-graph absmax each
  batch — no calibration needed, the default) or static from a
  calibration pass (``calibrate_scales``), which removes the per-conv
  reduction at serving time;
- conv accumulates int32 on the MXU, rescales to the compute dtype, and
  bias/BN-folded-bias/residual/relu run unquantized exactly as in the
  bf16 path.

Routing follows the sparse-execution pattern: ``build_quant_plans``
returns ``{conv_name: QuantConv}`` consumed by ``drn_forward``'s
``sparse_plans`` dispatch (tpuseg/models/drn.py:_conv_maybe_bn).

Accuracy: quantization changes numerics — this is an opt-in serving mode
(``seg_video --quantize``), reported separately from the bf16 headline.
``ids_agreement`` quantifies the effect as the fraction of argmax class
ids that match the bf16 path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class QuantConv:
    """Int8 execution plan for one conv layer."""

    w_q: jax.Array               # (KH, KW, C, O) int8
    w_scale: jax.Array           # (O,) f32 per-output-channel
    stride: int
    dilation: int
    padding: int
    x_scale: float | None = None  # static activation scale; None = dynamic

    def apply(self, x: jax.Array) -> jax.Array:
        if self.x_scale is None:
            # dynamic scale PER FRAME (reduce over HWC only) so a frame's
            # predictions never depend on which frames share its batch —
            # including the replicated padding frames a short final batch
            # gets (a whole-batch absmax would couple them)
            absmax = jnp.max(
                jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True
            )
            x_scale = jnp.maximum(absmax, 1e-8) / 127.0  # (N,1,1,1)
        else:
            x_scale = jnp.float32(self.x_scale)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, self.w_q,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * (x_scale * self.w_scale)


def quantize_weight(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(KH, KW, C, O) float -> (int8 weights, (O,) per-channel scales)."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    scale = np.maximum(absmax, 1e-8) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale.astype(np.float32)


def build_quant_plans(
    params,
    spec,
    *,
    min_channels: int = 128,
    stages: tuple[int, ...] = (4, 5, 6, 7, 8),
    x_scales: dict[str, float] | None = None,
) -> dict[str, QuantConv]:
    """Quantize the eligible convs of a (BN-folded) DRN param dict.

    Eligible: stride-1 convs (3x3 and the bottleneck 1x1s) in ``stages``
    with >= ``min_channels`` in/out channels — the MXU-roofline layers
    where int8's 2x rate pays (stages 5-8 plus stage 4: 151.8 -> 153.8
    fps on drn_d_22).
    The low-channel frontend and the seg head stay bf16 (layout-bound and
    accuracy-critical respectively).  ``x_scales`` (from
    ``calibrate_scales``) switches layers to static activation scales.
    """
    plans: dict[str, QuantConv] = {}

    def consider(cdef):
        if cdef.stride != 1:
            return
        w = np.asarray(params[f"{cdef.name}.weight"], np.float32)
        if w.shape[2] < min_channels or w.shape[3] < min_channels:
            return
        wq, ws = quantize_weight(w)
        plans[cdef.name] = QuantConv(
            w_q=jnp.asarray(wq),
            w_scale=jnp.asarray(ws),
            stride=cdef.stride,
            dilation=cdef.dilation,
            padding=cdef.padding,
            x_scale=(x_scales or {}).get(cdef.name),
        )

    for key, sdef in spec.stages:
        # stage index from either naming: seg "layer.5" or cls "layer5"
        # (the old dot-split parse raised on cls keys and silently built
        # ZERO plans for classifier specs — int8 eval then ran fp)
        import re

        m = re.search(r"(\d+)$", key)
        if not m:
            continue
        idx = int(m.group(1))
        if idx not in stages:
            continue
        for cdef, _bn in sdef.convs:
            consider(cdef)
        for blk in sdef.blocks:
            for cdef in blk.convs:
                consider(cdef)
    return plans


def build_cls_quant_plans(
    params,
    *,
    min_channels: int = 16,
    x_scales: dict[str, float] | None = None,
    groups: int = 1,
) -> dict[str, QuantConv]:
    """Quantize the eligible convs of a CLASSIFIER param dict (the cifar/
    tvresnet zoo) for ``cifar_forward(..., plans=...)`` dispatch — the
    classifier-side compression-serving counterpart of ``build_quant_plans``
    (reference eval path: rmbsnn_main.py:502-549).

    Eligible: square 1x1/3x3 conv weights (HWIO) with >= ``min_channels``
    in/out channels; padding is derived from the kernel ((k-1)//2) and
    dilation is 1 — true for every conv in the zoo.  The 3-channel input
    stem is excluded by the channel floor.  Stride is baked as 1; the
    forward's dispatch skips plans at stride-2 call sites.

    Pass the spec's ``groups`` for resnext-style archs: their grouped
    3x3 convs (HWIO cin = cout/groups) can never dispatch (``_pconv``
    only applies plans at groups == 1), so building plans for them
    would waste memory and overstate the reported int8 coverage.
    """
    plans: dict[str, QuantConv] = {}
    for key, w in params.items():
        if not key.endswith(".weight"):
            continue
        w = np.asarray(w)
        if w.ndim != 4 or w.shape[0] != w.shape[1] or w.shape[0] not in (1, 3):
            continue
        if w.shape[2] < min_channels or w.shape[3] < min_channels:
            continue
        if groups > 1 and w.shape[0] == 3 and w.shape[2] * groups == w.shape[3]:
            continue  # grouped bottleneck conv2 — undispatchable
        name = key[: -len(".weight")]
        wq, ws = quantize_weight(w.astype(np.float32))
        plans[name] = QuantConv(
            w_q=jnp.asarray(wq),
            w_scale=jnp.asarray(ws),
            stride=1,
            dilation=1,
            padding=(w.shape[0] - 1) // 2,
            x_scale=(x_scales or {}).get(name),
        )
    return plans


def calibrate_scales(
    params, state, spec, frames, *, plans: dict[str, QuantConv],
    compute_dtype=jnp.bfloat16, stem_fn=None, stem_stages: int = 1,
) -> dict[str, float]:
    """Static activation scales: run the unquantized forward over
    calibration ``frames`` with absmax probes on each quantized conv's
    input.  The probes append traced absmax values that the jitted pass
    returns as extra outputs — no host callbacks (the axon relay rejects
    jax.debug.callback) and no eager execution (op-by-op over the relay
    costs ~25 ms/op; measured minutes per frame).

    Returns {conv_name: x_scale}; feed back into ``build_quant_plans``.
    Static scales remove the per-conv absmax reduction at serving time:
    153.8 -> 165.6 fps at 1024x2048 batch 8 on v5e."""
    from tpuseg.models.drn import drn_forward

    # The probes record traced absmaxes into this dict while drn_forward is
    # being traced; ``fwd`` then RETURNS the dict, making each absmax an
    # explicit name-keyed output of the jitted function — the name->value
    # association lives in the output pytree structure, not in trace-order
    # side effects, so retraces/cache hits cannot mis-pair them.
    recorded: dict[str, jax.Array] = {}

    class _Probe:
        """Plan that records its input absmax then runs the float conv."""

        def __init__(self, name, plan):
            self.name, self.plan = name, plan

        def apply(self, x):
            recorded[self.name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            w = (self.plan.w_q.astype(jnp.float32) *
                 self.plan.w_scale).astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x, w,
                window_strides=(self.plan.stride,) * 2,
                padding=[(self.plan.padding,) * 2] * 2,
                rhs_dilation=(self.plan.dilation,) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

    probe_plans = {n: _Probe(n, p) for n, p in plans.items()}

    @jax.jit
    def fwd(batch):
        recorded.clear()
        drn_forward(params, state, batch, spec, train=False,
                    compute_dtype=compute_dtype, sparse_plans=probe_plans,
                    stem_fn=stem_fn, stem_stages=stem_stages)
        return dict(recorded)

    probes: dict[str, float] = {name: 0.0 for name in plans}
    for batch in frames:
        amaxes = jax.tree.map(np.asarray, fwd(jnp.asarray(batch)))
        for n, v in amaxes.items():
            probes[n] = max(probes[n], float(v))
    return {n: v / 127.0 for n, v in probes.items() if v > 0}


def ids_agreement(ids_a: np.ndarray, ids_b: np.ndarray) -> float:
    """Fraction of pixels whose argmax class id matches between two runs."""
    a, b = np.asarray(ids_a), np.asarray(ids_b)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float((a == b).mean())
