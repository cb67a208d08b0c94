"""Dilated Residual Networks (DRN), TPU-native functional implementation.

Behavioral reference: /root/reference/drn.py (DRN class, lines 109-259;
constructors lines 333-414).  This is a ground-up JAX re-design, not a port:

- Parameters live in a *flat dict* ``{torch-style name: array}``.  Conv
  weights are stored in HWIO layout (TPU-friendly); BatchNorm running stats
  live in a separate flat ``state`` dict.  Names match the torch
  ``state_dict()`` of the reference exactly (modulo layout), so the shipped
  pruning configs (``optimal_configs/*.json``) and ``.pth`` checkpoints key
  straight in.
- The forward pass is a pure function ``(params, state, x) -> (out, taps,
  new_state)`` traced once under ``jax.jit``; data layout is NHWC so XLA
  tiles convs onto the MXU without transposes.
- Compute dtype is configurable (bfloat16 on TPU); accumulation is f32.

Naming scheme
-------------
Stage ``i`` of the backbone contributes keys ``{prefix}{i}{sep}<rest>``:

- classification DRN (reference ``drn.DRN``): prefix ``layer``, sep ``.``
  -> ``layer3.0.conv1.weight``
- DRNSeg backbone (reference wraps stages in an ``nn.Sequential`` attr
  ``self.layer``, semantic_seg.py:135): prefix ``layer.``, sep ``.``
  -> ``layer.3.0.conv1.weight``
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, jax.Array]
State = dict[str, jax.Array]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

# arch name -> (block kind, per-stage block counts)
# cf. /root/reference/drn.py:333-414
DRN_ARCHS: dict[str, tuple[str, list[int], str]] = {
    # DRN_A: ResNet-style stem (7x7 s2 + maxpool) with dilated layer3/4 and a
    # Linear head (/root/reference/drn.py:262-330, drn_a_50 at :333-337)
    "drn_a_50": ("bottleneck", [3, 4, 6, 3], "A"),
    "drn_c_26": ("basic", [1, 1, 2, 2, 2, 2, 1, 1], "C"),
    "drn_c_42": ("basic", [1, 1, 3, 4, 6, 3, 1, 1], "C"),
    "drn_c_58": ("bottleneck", [1, 1, 3, 4, 6, 3, 1, 1], "C"),
    "drn_d_22": ("basic", [1, 1, 2, 2, 2, 2, 1, 1], "D"),
    "drn_d_24": ("basic", [1, 1, 2, 2, 2, 2, 2, 2], "D"),
    "drn_d_38": ("basic", [1, 1, 3, 4, 6, 3, 1, 1], "D"),
    "drn_d_40": ("basic", [1, 1, 3, 4, 6, 3, 2, 2], "D"),
    "drn_d_54": ("bottleneck", [1, 1, 3, 4, 6, 3, 1, 1], "D"),
    "drn_d_56": ("bottleneck", [1, 1, 3, 4, 6, 3, 2, 2], "D"),
    "drn_d_105": ("bottleneck", [1, 1, 3, 4, 23, 3, 1, 1], "D"),
    "drn_d_107": ("bottleneck", [1, 1, 3, 4, 23, 3, 2, 2], "D"),
}

DEFAULT_CHANNELS = (16, 32, 64, 128, 256, 512, 512, 512)
EXPANSION = {"basic": 1, "bottleneck": 4}


# --------------------------------------------------------------------------
# Static architecture spec
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvDef:
    name: str
    cin: int
    cout: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    bias: bool = False


@dataclasses.dataclass(frozen=True)
class BNDef:
    name: str
    ch: int


@dataclasses.dataclass(frozen=True)
class BlockDef:
    """One residual block (basic or bottleneck)."""

    kind: str  # "basic" | "bottleneck"
    convs: tuple[ConvDef, ...]
    bns: tuple[BNDef, ...]
    downsample: tuple[ConvDef, BNDef] | None
    residual: bool


@dataclasses.dataclass(frozen=True)
class StageDef:
    """A backbone stage: either plain conv-bn-relu repeats or residual blocks."""

    kind: str  # "convs" | "blocks"
    convs: tuple[tuple[ConvDef, BNDef], ...] = ()
    blocks: tuple[BlockDef, ...] = ()


@dataclasses.dataclass(frozen=True)
class DrnSpec:
    arch: str
    variant: str  # "A" | "C" | "D"
    stages: tuple[tuple[str, StageDef], ...]  # (stage key prefix, stage)
    out_dim: int
    num_classes: int
    pool_size: int
    fc_name: str | None
    # DRN_A: 3x3/s2 maxpool after the stem, stride-1 avgpool, Linear head
    # (drn.py:272,280-281)
    stem_maxpool: bool = False
    linear_fc: bool = False


def _make_blocks_stage(
    key: Callable[[str], str],
    kind: str,
    inplanes: int,
    planes: int,
    n_blocks: int,
    stride: int,
    dilation: int,
    new_level: bool,
    residual: bool,
    a_style: bool = False,
) -> tuple[StageDef, int]:
    """Residual-block stage builder.

    Mirrors the semantics of the reference ``DRN._make_layer``
    (/root/reference/drn.py:177-199): first block takes the stride and a
    possibly-halved first dilation, and a 1x1-conv downsample path appears
    when the shape changes.  ``a_style`` follows ``DRN_A._make_layer``
    (drn.py:297-314) instead: the first block always runs at dilation 1.
    """
    assert dilation == 1 or dilation % 2 == 0
    expansion = EXPANSION[kind]
    if a_style:
        first_dil = (1, 1)
    else:
        first_dil = (
            (1, 1)
            if dilation == 1
            else ((dilation // 2 if new_level else dilation), dilation)
        )
    blocks = []
    for b in range(n_blocks):
        dil = first_dil if b == 0 else (dilation, dilation)
        bname = key(str(b))
        downsample = None
        if b == 0 and (stride != 1 or inplanes != planes * expansion):
            downsample = (
                ConvDef(f"{bname}.downsample.0", inplanes, planes * expansion, 1, stride),
                BNDef(f"{bname}.downsample.1", planes * expansion),
            )
        s = stride if b == 0 else 1
        if kind == "basic":
            convs = (
                ConvDef(f"{bname}.conv1", inplanes, planes, 3, s, dil[0], dil[0]),
                ConvDef(f"{bname}.conv2", planes, planes, 3, 1, dil[1], dil[1]),
            )
            bns = (BNDef(f"{bname}.bn1", planes), BNDef(f"{bname}.bn2", planes))
            out = planes
        else:
            convs = (
                ConvDef(f"{bname}.conv1", inplanes, planes, 1),
                ConvDef(f"{bname}.conv2", planes, planes, 3, s, dil[1], dil[1]),
                ConvDef(f"{bname}.conv3", planes, planes * 4, 1),
            )
            bns = (
                BNDef(f"{bname}.bn1", planes),
                BNDef(f"{bname}.bn2", planes),
                BNDef(f"{bname}.bn3", planes * 4),
            )
            out = planes * 4
        blocks.append(BlockDef(kind, convs, bns, downsample, residual))
        inplanes = out
    return StageDef("blocks", blocks=tuple(blocks)), inplanes


def _make_convs_stage(
    key: Callable[[str], str],
    inplanes: int,
    channels: int,
    n_convs: int,
    stride: int = 1,
    dilation: int = 1,
) -> tuple[StageDef, int]:
    """Plain conv-bn-relu stage (reference ``_make_conv_layers``, drn.py:201-211).

    The reference flattens each (conv, bn, relu) triple into one Sequential,
    so conv ``j`` gets index ``3*j`` and its BN index ``3*j+1``.
    """
    convs = []
    for j in range(n_convs):
        convs.append(
            (
                ConvDef(
                    key(str(3 * j)),
                    inplanes,
                    channels,
                    3,
                    stride if j == 0 else 1,
                    dilation,
                    dilation,
                ),
                BNDef(key(str(3 * j + 1)), channels),
            )
        )
        inplanes = channels
    return StageDef("convs", convs=tuple(convs)), inplanes


def build_drn_spec(
    arch: str,
    num_classes: int = 1000,
    channels: tuple[int, ...] = DEFAULT_CHANNELS,
    pool_size: int = 28,
    naming: str = "cls",
) -> DrnSpec:
    """Build the static spec for a DRN architecture.

    ``naming='cls'`` produces torch-DRN keys (``layer3.0.conv1.weight``);
    ``naming='seg'`` produces DRNSeg-Sequential keys (``layer.3.0.conv1.weight``)
    matching the reference head wrapper (semantic_seg.py:135).
    """
    kind, layers, variant = DRN_ARCHS[arch]
    sep = "." if naming == "seg" else ""
    prefix = "layer." if naming == "seg" else "layer"

    def stage_key(i: int) -> Callable[[str], str]:
        return lambda rest: f"{prefix}{i}.{rest}"

    stages: list[tuple[str, StageDef]] = []
    inplanes = channels[0]

    if variant == "A":
        # DRN_A (drn.py:262-330): 7x7/s2 stem + maxpool, four ResNet layers
        # with dilation 1/1/2/4, stride-1 avgpool, Linear head.
        if naming == "seg":
            raise ValueError("DRN-A variants are classification-only")
        inplanes = 64
        stem = StageDef(
            "convs",
            convs=((ConvDef("conv1", 3, 64, 7, 2, 1, 3), BNDef("bn1", 64)),),
        )
        stages.append(("stem", stem))
        plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        for i, (planes, stride, dil) in enumerate(plan, start=1):
            st, inplanes = _make_blocks_stage(
                stage_key(i), kind, inplanes, planes, layers[i - 1],
                stride, dil, False, True, a_style=True,
            )
            stages.append((f"{prefix}{i}", st))
        return DrnSpec(
            arch=arch,
            variant="A",
            stages=tuple(stages),
            out_dim=inplanes,
            num_classes=num_classes,
            pool_size=pool_size,
            fc_name="fc" if num_classes > 0 else None,
            stem_maxpool=True,
            linear_fc=True,
        )

    if variant == "C":
        # conv1/bn1 at top level (drn.py:121-130); C-arch is used for
        # classification only in the reference, so 'seg' naming is unsupported.
        if naming == "seg":
            raise ValueError("DRN-C variants are classification-only")
        stage0 = StageDef(
            "convs",
            convs=((ConvDef("conv1", 3, channels[0], 7, 1, 1, 3), BNDef("bn1", channels[0])),),
        )
        stages.append(("stem", stage0))
        s1, inplanes = _make_blocks_stage(
            stage_key(1), "basic", inplanes, channels[0], layers[0], 1, 1, True, True
        )
        stages.append((f"{prefix}1", s1))
        s2, inplanes = _make_blocks_stage(
            stage_key(2), "basic", inplanes, channels[1], layers[1], 2, 1, True, True
        )
        stages.append((f"{prefix}2", s2))
    else:
        s0 = StageDef(
            "convs",
            convs=(
                (
                    ConvDef(f"{prefix}0.0", 3, channels[0], 7, 1, 1, 3),
                    BNDef(f"{prefix}0.1", channels[0]),
                ),
            ),
        )
        stages.append((f"{prefix}0", s0))
        s1, inplanes = _make_convs_stage(stage_key(1), inplanes, channels[0], layers[0], 1)
        stages.append((f"{prefix}1", s1))
        s2, inplanes = _make_convs_stage(stage_key(2), inplanes, channels[1], layers[1], 2)
        stages.append((f"{prefix}2", s2))

    s3, inplanes = _make_blocks_stage(
        stage_key(3), kind, inplanes, channels[2], layers[2], 2, 1, True, True
    )
    stages.append((f"{prefix}3", s3))
    s4, inplanes = _make_blocks_stage(
        stage_key(4), kind, inplanes, channels[3], layers[3], 2, 1, True, True
    )
    stages.append((f"{prefix}4", s4))
    s5, inplanes = _make_blocks_stage(
        stage_key(5), kind, inplanes, channels[4], layers[4], 1, 2, False, True
    )
    stages.append((f"{prefix}5", s5))
    if layers[5] != 0:
        s6, inplanes = _make_blocks_stage(
            stage_key(6), kind, inplanes, channels[5], layers[5], 1, 4, False, True
        )
        stages.append((f"{prefix}6", s6))

    if variant == "C":
        if layers[6] != 0:
            s7, inplanes = _make_blocks_stage(
                stage_key(7), "basic", inplanes, channels[6], layers[6], 1, 2, False, False
            )
            stages.append((f"{prefix}7", s7))
        if layers[7] != 0:
            s8, inplanes = _make_blocks_stage(
                stage_key(8), "basic", inplanes, channels[7], layers[7], 1, 1, False, False
            )
            stages.append((f"{prefix}8", s8))
    else:
        if layers[6] != 0:
            s7, inplanes = _make_convs_stage(stage_key(7), inplanes, channels[6], layers[6], 1, 2)
            stages.append((f"{prefix}7", s7))
        if layers[7] != 0:
            s8, inplanes = _make_convs_stage(stage_key(8), inplanes, channels[7], layers[7], 1, 1)
            stages.append((f"{prefix}8", s8))

    return DrnSpec(
        arch=arch,
        variant=variant,
        stages=tuple(stages),
        out_dim=inplanes,
        num_classes=num_classes,
        pool_size=pool_size,
        fc_name="fc" if num_classes > 0 and naming == "cls" else None,
    )


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------


def rng_from_key(key) -> np.random.Generator:
    """Host-side numpy Generator deterministically derived from a JAX PRNG key
    (or a plain int seed).  Init happens on the host so that building a model
    never triggers dozens of tiny XLA compiles."""
    if isinstance(key, (int, np.integer)):
        return np.random.default_rng(int(key))
    data = np.asarray(jax.random.key_data(key)).reshape(-1).astype(np.uint32)
    return np.random.default_rng(np.random.SeedSequence(data.tolist()))


def _he_normal_conv(rng: np.random.Generator, cdef: ConvDef) -> np.ndarray:
    """He init matching the reference (std = sqrt(2 / (kh*kw*cout)), drn.py:169-172).

    Stored HWIO: (kh, kw, cin, cout).
    """
    n = cdef.kernel * cdef.kernel * cdef.cout
    std = math.sqrt(2.0 / n)
    shape = (cdef.kernel, cdef.kernel, cdef.cin, cdef.cout)
    return (std * rng.standard_normal(shape)).astype(np.float32)


def _init_conv_bn(
    rng: np.random.Generator,
    cdef: ConvDef,
    bdef: BNDef | None,
    params: Params,
    state: State,
) -> None:
    params[f"{cdef.name}.weight"] = _he_normal_conv(rng, cdef)
    if cdef.bias:
        params[f"{cdef.name}.bias"] = np.zeros((cdef.cout,), np.float32)
    if bdef is not None:
        params[f"{bdef.name}.weight"] = np.ones((bdef.ch,), np.float32)
        params[f"{bdef.name}.bias"] = np.zeros((bdef.ch,), np.float32)
        state[f"{bdef.name}.running_mean"] = np.zeros((bdef.ch,), np.float32)
        state[f"{bdef.name}.running_var"] = np.ones((bdef.ch,), np.float32)


def init_drn(key, spec: DrnSpec) -> tuple[Params, State]:
    """Initialize a flat param dict + BN state dict for ``spec``.

    ``key`` is a JAX PRNG key or an int seed; generation runs on the host.
    """
    rng = rng_from_key(key)
    params: Params = {}
    state: State = {}
    for _, stage in spec.stages:
        if stage.kind == "convs":
            for cdef, bdef in stage.convs:
                _init_conv_bn(rng, cdef, bdef, params, state)
        else:
            for block in stage.blocks:
                for cdef, bdef in zip(block.convs, block.bns):
                    _init_conv_bn(rng, cdef, bdef, params, state)
                if block.downsample is not None:
                    _init_conv_bn(rng, *block.downsample, params, state)
    if spec.fc_name is not None:
        if spec.linear_fc:
            # DRN_A Linear head (drn.py:280); torch-default uniform init,
            # stored in torch (out, in) layout like the cifar zoo.
            bound = 1.0 / math.sqrt(spec.out_dim)
            params[f"{spec.fc_name}.weight"] = rng.uniform(
                -bound, bound, size=(spec.num_classes, spec.out_dim)
            ).astype(np.float32)
            params[f"{spec.fc_name}.bias"] = rng.uniform(
                -bound, bound, size=(spec.num_classes,)
            ).astype(np.float32)
        else:
            # 1x1 conv classifier head (drn.py:167-168)
            cdef = ConvDef(spec.fc_name, spec.out_dim, spec.num_classes, 1, bias=True)
            _init_conv_bn(rng, cdef, None, params, state)
    return params, state


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
    compute_dtype=None,
    groups: int = 1,
) -> jax.Array:
    """NHWC x HWIO conv.

    Output dtype follows the operands (standard mixed-precision policy): the
    MXU accumulates bf16 matmuls in f32 internally, and an explicit
    ``preferred_element_type=f32`` would break the conv VJP in this JAX
    version (the transpose conv mixes the f32 cotangent with bf16 operands).
    BatchNorm upcasts to f32 right after each conv, so precision-critical
    arithmetic stays in f32 either way.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def batch_norm(
    x: jax.Array,
    params: Params,
    state: State,
    updates: State,
    name: str,
    train: bool,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
) -> jax.Array:
    """BatchNorm matching torch semantics (biased batch var for normalization,
    unbiased var in the running-stat EMA)."""
    scale = params[f"{name}.weight"]
    bias = params[f"{name}.bias"]
    axes = tuple(range(x.ndim - 1))  # all but channel — works for 2D and 4D
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        n = int(np.prod([x.shape[a] for a in axes]))
        unbiased = var * (n / max(n - 1, 1))
        updates[f"{name}.running_mean"] = (
            (1 - momentum) * state[f"{name}.running_mean"] + momentum * mean
        )
        updates[f"{name}.running_var"] = (
            (1 - momentum) * state[f"{name}.running_var"] + momentum * unbiased
        )
    else:
        mean = state[f"{name}.running_mean"]
        var = state[f"{name}.running_var"]
    inv = jax.lax.rsqrt(var + eps) * scale
    out = (x.astype(jnp.float32) - mean) * inv + bias
    return out.astype(x.dtype)


def _conv_maybe_bn(
    x, params, state, updates, cdef, bdef, train, compute_dtype, sparse_plans=None
):
    """conv -> (folded bias | batch norm).  When the BN params are absent
    (inference-folded weights, tpuseg.ops.fold_bn), the conv carries a bias
    instead and normalization is skipped entirely.  A layer listed in
    ``sparse_plans`` executes via the fused block-sparse Pallas kernel."""
    if sparse_plans and cdef.name in sparse_plans:
        from tpuseg.ops.rbgp_matmul import RbgpPlan, rbgp_conv_apply
        from tpuseg.ops.sparse_conv import fused_sparse_conv_apply
        from tpuseg.ops.sparse_train import SparseTrainStruct, sparse_conv_train

        out_dtype = x.dtype if compute_dtype is None else compute_dtype
        plan = sparse_plans[cdef.name]
        if isinstance(plan, SparseTrainStruct):
            # trainable sparse execution: packs the live weights each step,
            # sparse dgrad/wgrad via custom VJP (tpuseg.ops.sparse_train)
            x = sparse_conv_train(
                x, params[f"{cdef.name}.weight"], plan,
                compute_dtype=out_dtype if compute_dtype else jnp.float32,
            ).astype(out_dtype)
        elif isinstance(plan, RbgpPlan):
            x = rbgp_conv_apply(
                x, plan, cdef.stride, cdef.dilation, cdef.padding
            ).astype(out_dtype)
        else:
            from tpuseg.ops.sparse_conv import (
                FusedSparseConvQ,
                fused_sparse_conv_apply_q,
            )

            if isinstance(plan, FusedSparseConvQ):
                x = fused_sparse_conv_apply_q(x, plan).astype(out_dtype)
            elif hasattr(plan, "apply"):
                # CompactSparse(Q), int8 QuantConv, calibration probes
                x = plan.apply(x).astype(out_dtype)
            else:
                x = fused_sparse_conv_apply(x, plan).astype(out_dtype)
    else:
        x = conv2d(
            x,
            params[f"{cdef.name}.weight"],
            cdef.stride,
            cdef.dilation,
            cdef.padding,
            compute_dtype,
        )
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    bias = params.get(f"{cdef.name}.bias")
    if bias is not None:
        x = x + bias.astype(x.dtype)
    if bdef is not None and f"{bdef.name}.weight" in params:
        x = batch_norm(x, params, state, updates, bdef.name, train)
    return x


def _run_conv_bn_relu(
    x, params, state, updates, cdef: ConvDef, bdef: BNDef, train, compute_dtype,
    sparse_plans=None,
):
    x = _conv_maybe_bn(
        x, params, state, updates, cdef, bdef, train, compute_dtype, sparse_plans
    )
    return jax.nn.relu(x)


def _run_block(x, params, state, updates, block: BlockDef, train, compute_dtype,
               sparse_plans=None):
    residual = x
    out = x
    n = len(block.convs)
    for i, (cdef, bdef) in enumerate(zip(block.convs, block.bns)):
        out = _conv_maybe_bn(
            out, params, state, updates, cdef, bdef, train, compute_dtype,
            sparse_plans,
        )
        if i < n - 1:
            out = jax.nn.relu(out)
    if block.downsample is not None:
        cdef, bdef = block.downsample
        residual = _conv_maybe_bn(
            residual, params, state, updates, cdef, bdef, train, compute_dtype,
            sparse_plans,
        )
    # Bottleneck always adds the residual (drn.py:103); BasicBlock honors the
    # flag (drn.py:61-62) even when a downsample path exists.
    if block.kind == "bottleneck" or block.residual:
        out = out + residual
    return jax.nn.relu(out)


def _run_stage(
    params, state, x, stage: StageDef, train, compute_dtype, sparse_plans
):
    """One backbone stage as a pure function: ``(params, state, x) ->
    (x, bn_updates)``.  Functional (no closure-mutated dict) so it can be
    wrapped in ``jax.checkpoint`` for rematerialized training."""
    updates: State = {}
    if stage.kind == "convs":
        for cdef, bdef in stage.convs:
            x = _run_conv_bn_relu(
                x, params, state, updates, cdef, bdef, train, compute_dtype,
                sparse_plans,
            )
    else:
        for block in stage.blocks:
            x = _run_block(
                x, params, state, updates, block, train, compute_dtype,
                sparse_plans,
            )
    return x, updates


def drn_forward(
    params: Params,
    state: State,
    x: jax.Array,
    spec: DrnSpec,
    *,
    train: bool = False,
    out_map: bool = False,
    out_middle: bool = False,
    compute_dtype: Any = None,
    stem_fn: Callable | None = None,
    stem_stages: int = 1,
    sparse_plans=None,
    remat: bool = False,
) -> tuple[jax.Array, list[jax.Array], State]:
    """Run the DRN backbone.

    ``x`` is NHWC.  Returns ``(output, middle_taps, bn_state_updates)``.
    With ``num_classes == 0`` (feature extractor), returns the final feature map.

    ``stem_fn`` optionally replaces the first ``stem_stages`` stages
    (inference with BN-folded weights only) — used to swap in the
    MXU-efficient polyphase frontend (tpuseg.ops.polyphase).  When it covers
    a single conv stage, the trailing ReLU is applied here; multi-stage
    frontends apply their own activations.

    ``remat=True`` wraps every stage in ``jax.checkpoint``: under autodiff
    only the 8 stage-boundary activations are saved and each stage's
    internals are recomputed during the backward pass — the standard TPU
    FLOPs-for-HBM trade that unlocks large-crop/large-batch training.
    Checkpointing replays the same ops on the same inputs, so gradients
    are mathematically identical (bitwise on the CPU test path,
    tests/test_remat.py; TPU bf16 may differ at rounding level because
    XLA fuses the recompute differently).  The value-only (inference)
    path is unaffected by construction.
    """
    updates: State = {}
    taps: list[jax.Array] = []
    if compute_dtype is not None and stem_fn is None:
        # a stem_fn owns its own input handling (e.g. the polyphase frontend
        # space-to-depths RAW uint8 frames before any float math — casting
        # here would force the slow 3-lane full-res path)
        x = x.astype(compute_dtype)
    for stage_index, (stage_name, stage) in enumerate(spec.stages):
        if stem_fn is not None and stage_index < stem_stages:
            if stage_index == 0:
                x = stem_fn(x)
                if stem_stages == 1:
                    x = jax.nn.relu(x)
            # replaced stages contribute no taps before layer1 anyway
            continue

        def stage_fn(params, state, x, _stage=stage):
            return _run_stage(
                params, state, x, _stage, train, compute_dtype, sparse_plans
            )

        if remat:
            stage_fn = jax.checkpoint(stage_fn)
        x, stage_updates = stage_fn(params, state, x)
        updates.update(stage_updates)
        if stage_name == "stem" and spec.stem_maxpool:
            # DRN_A 3x3/s2/p1 maxpool after the stem (drn.py:272,318)
            x = jax.lax.reduce_window(
                x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)],
            )
        if not stage_name.endswith("0") and stage_name != "stem":
            taps.append(x)

    if spec.fc_name is not None and spec.linear_fc:
        # DRN_A head: stride-1 avgpool -> flatten -> Linear (drn.py:279-280,
        # 325-328).  Weight is torch (out, in) layout.  The window is
        # clamped to the feature grid: at the designed 224 input the grid
        # IS pool_size x pool_size (global pooling, identical), while a
        # smaller input would otherwise emit ZERO windows and silently
        # return (B, 0) logits.
        p = min(spec.pool_size, x.shape[1], x.shape[2])
        x = jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.add,
            (1, p, p, 1), (1, 1, 1, 1), "VALID",
        ) / float(p * p)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        x = x.reshape(x.shape[0], -1)
        w = params[f"{spec.fc_name}.weight"]
        b = params[f"{spec.fc_name}.bias"]
        x = x @ w.astype(x.dtype).T + b.astype(x.dtype)
    elif spec.fc_name is not None:
        w = params[f"{spec.fc_name}.weight"]
        b = params[f"{spec.fc_name}.bias"]
        if out_map:
            x = conv2d(x, w, compute_dtype=compute_dtype) + b
        else:
            # AvgPool(pool_size) then 1x1 conv then flatten (drn.py:249-254)
            # — window clamped to the feature grid (identical at the
            # designed 224 input where grid == pool_size; smaller inputs
            # would otherwise produce (B, 0) logits)
            p = min(spec.pool_size, x.shape[1], x.shape[2])
            x = jax.lax.reduce_window(
                x.astype(jnp.float32),
                0.0,
                jax.lax.add,
                (1, p, p, 1),
                (1, p, p, 1),
                "VALID",
            ) / float(p * p)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            x = conv2d(x, w, compute_dtype=compute_dtype) + b
            x = x.reshape(x.shape[0], -1)
    if out_middle:
        return x, taps, updates
    return x, [], updates
