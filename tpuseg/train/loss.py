"""Loss functions.

- segmentation: CrossEntropyLoss(ignore_index=255) applied to the model's
  log-softmax output (semantic_seg.py:817,197-198).  log_softmax is
  idempotent, so CE-on-log-probs == NLL-of-log-probs; we take NLL directly.
- knowledge distillation: KL(log_softmax(student/T) || softmax(teacher/T)),
  summed over classes, averaged over batch, mixed with the hard CE
  (rmbsnn_main.py:459-469; default weights 0.5/0.5, temperature 4.0 per
  flags rmbsnn_main.py:106-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = 255


def seg_loss_from_logprobs(logp: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean NLL over non-ignored pixels.

    ``logp``: (N, H, W, C) log-probabilities.  ``labels``: (N, H, W) int.
    """
    c = logp.shape[-1]
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = -jnp.where(valid, picked, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def cross_entropy_ignore(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """CE from raw logits with an ignore index (classification uses
    ignore-free labels; segmentation may pass 255)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = -jnp.where(valid, picked, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def kd_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    temperature: float = 4.0,
) -> jax.Array:
    """Distillation term: KL of temperature-softened distributions, summed
    over classes and batch then divided by batch size (matching
    ``F.kl_div(..., size_average=False) / batch`` in rmbsnn_main.py:467)."""
    t = temperature
    s_logp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    t_prob = jax.nn.softmax(
        jax.lax.stop_gradient(teacher_logits.astype(jnp.float32)) / t, axis=-1
    )
    kl = t_prob * (jnp.log(jnp.clip(t_prob, 1e-30)) - s_logp)
    return kl.sum() / student_logits.shape[0]


def combined_kd_loss(
    student_logits,
    labels,
    teacher_logits,
    student_wt: float = 0.5,
    distill_wt: float = 0.5,
    temperature: float = 4.0,
):
    # classification labels have no ignore value (the reference's hard term
    # is a plain CrossEntropyLoss, rmbsnn_main.py:459-462) — the seg default
    # of 255 would silently drop class-255 samples on >=256-class datasets
    hard = cross_entropy_ignore(student_logits, labels, ignore_index=-1)
    soft = kd_loss(student_logits, teacher_logits, temperature)
    return student_wt * hard + distill_wt * soft
