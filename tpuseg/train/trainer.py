"""Jitted train/eval steps.

One functional core: ``(state, batch) -> (state', metrics)``, traced once and
compiled by XLA.  The masked-weight projection runs INSIDE the step right
after the optimizer update (the reference re-applies masks after every
``optimizer.step()``: semantic_seg.py:213-214, rmbsnn_main.py:483-484), so
straight-through masked dense training costs one fused elementwise multiply.

Data parallelism: these steps are sharding-agnostic — wrap them with
``tpuseg.parallel.shard_train_step`` to run on a device mesh (replaces
DataParallel/DDP; XLA inserts the gradient all-reduce over ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax

from tpuseg.models.drn import DrnSpec, drn_forward
from tpuseg.models.drnseg import drnseg_forward
from tpuseg.sparsity.base import apply_masks
from tpuseg.train.loss import (
    combined_kd_loss,
    cross_entropy_ignore,
    seg_loss_from_logprobs,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    bn_state: dict
    opt_state: Any
    masks: dict
    step: jax.Array


def create_train_state(params, bn_state, tx: optax.GradientTransformation, masks=None):
    params = {k: jnp.asarray(v) for k, v in params.items()}
    bn_state = {k: jnp.asarray(v) for k, v in bn_state.items()}
    masks = {k: jnp.asarray(v) for k, v in (masks or {}).items()}
    if masks:
        params = apply_masks(params, masks)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        masks=masks,
        step=jnp.zeros((), jnp.int32),
    )


def _sgd_update(tx, grads, state: TrainState, frozen: tuple[str, ...] = ()):
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    if frozen:
        # Frozen params are excluded from the optimizer in the reference
        # (DRNSeg.optim_parameters skips the upsampler, semantic_seg.py:160-164),
        # so they see neither gradient nor weight decay.
        updates = {
            k: (jnp.zeros_like(v) if k in frozen else v) for k, v in updates.items()
        }
    new_params = optax.apply_updates(state.params, updates)
    if state.masks:
        new_params = apply_masks(new_params, state.masks)
    return new_params, new_opt


def make_seg_train_step(
    spec: DrnSpec,
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
    frozen: tuple[str, ...] = ("up.weight",),
    remat: bool = False,
    sparse_plans: Mapping | None = None,
) -> Callable:
    """Segmentation train step (parity with semantic_seg.train).

    ``frozen`` params get zero gradients (the reference freezes the bilinear
    upsampler, semantic_seg.py:151, and excludes it from optim_parameters).

    ``remat=True`` checkpoints each backbone stage (jax.checkpoint): the
    backward pass recomputes stage internals instead of keeping every
    conv/BN activation live, cutting peak HBM for large crops/batches at
    ~1/3 extra forward FLOPs.  Mathematically exact (same ops, same
    inputs) — bitwise identical on the CPU test path
    (tests/test_remat.py); on TPU bf16 the recompute compiles to a
    different fusion schedule, so losses can differ at rounding level
    (measured 8.006001 vs 8.006046 on the v5e chip).

    ``sparse_plans`` maps conv names to ``SparseTrainStruct``s
    (tpuseg.ops.sparse_train.build_sparse_train_structs): those convs run
    all three passes (fwd/dgrad/wgrad) through the fused block-sparse
    kernel at the mask's union block density instead of masked-dense —
    real sparse execution for the reference's core train loop
    (semantic_seg.py:181-227).  The trajectory of unmasked weights is
    identical to the masked-dense step up to float associativity: the
    only gradients that change are those at positions the per-step mask
    projection re-zeroes anyway (tests/test_sparse_train.py).
    """

    def loss_fn(params, bn_state, images, labels):
        logp, _seg, updates = drnseg_forward(
            params, bn_state, images, spec, train=True,
            compute_dtype=compute_dtype, remat=remat,
            sparse_plans=sparse_plans,
        )
        loss = seg_loss_from_logprobs(logp, labels)
        return loss, (updates, logp)

    def train_step(state: TrainState, images, labels):
        (loss, (bn_updates, logp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.bn_state, images, labels)
        grads = {
            k: (jnp.zeros_like(v) if k in frozen else v) for k, v in grads.items()
        }
        new_params, new_opt = _sgd_update(tx, grads, state, frozen)
        new_bn = {**state.bn_state, **bn_updates}
        new_state = TrainState(
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
            masks=state.masks,
            step=state.step + 1,
        )
        # NOTE: no preds in the metrics — a jit output cannot be DCE'd, and
        # a full-resolution argmax every step is pure waste; evaluation
        # computes predictions via make_eval_step.
        return new_state, {"loss": loss}

    return train_step


def classifier_forward(spec, compute_dtype=None, remat: bool = False,
                       sparse_plans: Mapping | None = None) -> Callable:
    """Uniform classifier forward ``(params, bn_state, x, train) ->
    (logits, bn_updates)`` for DRN and CIFAR-zoo specs.

    ``remat=True`` checkpoints each backbone stage (DRN) / stage-group
    (CIFAR zoo) — see make_seg_train_step's remat note; the trade and the
    exactness contract are identical.

    ``sparse_plans`` (DRN specs only — CIFAR-zoo channel widths are never
    /128 so no layer is ever eligible) routes masked convs through the
    trainable fused block-sparse kernel; see make_seg_train_step."""
    from tpuseg.models.cifar import CifarSpec, cifar_forward

    if isinstance(spec, CifarSpec):
        if sparse_plans:
            raise ValueError(
                "sparse_plans is not supported for CIFAR-zoo specs "
                "(channel widths are not /128; no eligible layer exists)"
            )

        def fwd(params, bn_state, x, train=False):
            return cifar_forward(
                params, bn_state, x, spec, train=train,
                compute_dtype=compute_dtype, remat=remat,
            )

    else:

        def fwd(params, bn_state, x, train=False):
            logits, _, updates = drn_forward(
                params, bn_state, x, spec, train=train,
                compute_dtype=compute_dtype, remat=remat,
                sparse_plans=sparse_plans,
            )
            return logits, updates

    return fwd


def make_cls_train_step(
    spec,
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
    teacher: tuple[Callable, Mapping, Mapping] | None = None,
    kd_student_wt: float = 0.5,
    kd_distill_wt: float = 0.5,
    kd_temperature: float = 4.0,
    remat: bool = False,
    sparse_plans: Mapping | None = None,
) -> Callable:
    """Classification train step with optional knowledge distillation
    (parity with rmbsnn_main.train, :432-500).  ``spec`` may be a DrnSpec or
    a CifarSpec.

    ``teacher`` is ``(forward_fn, params, bn_state)`` where ``forward_fn``
    maps ``(params, bn_state, images) -> logits``.

    ``remat`` checkpoints the STUDENT forward's stages (the teacher runs
    under stop_gradient — no activations are saved for it either way).

    ``sparse_plans`` routes the STUDENT's eligible masked convs through
    the trainable fused block-sparse kernel (DRN specs only; see
    classifier_forward).
    """
    fwd = classifier_forward(spec, compute_dtype, remat=remat,
                             sparse_plans=sparse_plans)

    def loss_fn(params, bn_state, images, labels):
        logits, updates = fwd(params, bn_state, images, train=True)
        if teacher is not None:
            t_fwd, t_params, t_bn = teacher
            t_logits = jax.lax.stop_gradient(t_fwd(t_params, t_bn, images))
            loss = combined_kd_loss(
                logits, labels, t_logits, kd_student_wt, kd_distill_wt, kd_temperature
            )
        else:
            loss = cross_entropy_ignore(logits, labels, ignore_index=-1)
        return loss, (updates, logits)

    def train_step(state: TrainState, images, labels):
        (loss, (bn_updates, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.bn_state, images, labels)
        new_params, new_opt = _sgd_update(tx, grads, state)
        new_state = TrainState(
            params=new_params,
            bn_state={**state.bn_state, **bn_updates},
            opt_state=new_opt,
            masks=state.masks,
            step=state.step + 1,
        )
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def make_eval_step(spec, kind: str = "seg", compute_dtype=jnp.bfloat16):
    """Eval step returning per-batch loss and predictions."""

    if kind == "seg":

        def eval_step(params, bn_state, images, labels):
            logp, _seg, _ = drnseg_forward(
                params, bn_state, images, spec, train=False, compute_dtype=compute_dtype
            )
            loss = seg_loss_from_logprobs(logp, labels)
            return loss, jnp.argmax(logp, axis=-1)

    else:
        fwd = classifier_forward(spec, compute_dtype)

        def eval_step(params, bn_state, images, labels):
            logits, _ = fwd(params, bn_state, images, train=False)
            loss = cross_entropy_ignore(logits, labels, ignore_index=-1)
            return loss, jnp.argmax(logits, axis=-1)

    return eval_step
