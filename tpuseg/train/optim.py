"""Optimizer + LR schedules.

Mirrors the reference training recipe: SGD(momentum=0.9, weight_decay=1e-4)
with MultiStepLR (semantic_seg.py:963-966,1002; milestone tables at
semantic_seg.py:852-874 and resume-relative at :992-1000), plus the
ImageNet step decay of rmbsnn_main.adjust_learning_rate (:600-639).

Torch-SGD semantics are reproduced exactly: weight decay is added to the
gradient *before* the momentum buffer update, and the update is
``-lr * buf``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


# epochs -> milestones (semantic_seg.py:852-874)
_MILESTONE_TABLE = {
    400: [60, 120, 180, 240, 300, 350],
    500: [60, 120, 180, 240, 300, 350, 400, 450],
    250: [50, 100, 150, 200],
    300: [50, 100, 150, 200, 250],
    200: [40, 80, 120, 160],
    150: [40, 80, 120],
}


def milestones_for_epochs(epochs: int, start_epoch: int = 0) -> list[int]:
    # resume-relative milestones apply ONLY for the 100/150-epoch recipes
    # (semantic_seg.py:992-1000); other epoch counts keep their table.
    if start_epoch and epochs == 100:
        return [start_epoch + 25, start_epoch + 50, start_epoch + 75]
    if start_epoch and epochs == 150:
        return [start_epoch + 40, start_epoch + 80, start_epoch + 120]
    if epochs in _MILESTONE_TABLE:
        return _MILESTONE_TABLE[epochs]
    # generic 1/2, 3/4 fallback (rmbsnn_main.py:606-608)
    return [epochs // 2, (3 * epochs) // 4]


def multistep_schedule(
    base_lr: float, milestones: list[int], gamma: float, steps_per_epoch: int
) -> optax.Schedule:
    """MultiStepLR in terms of optimizer steps."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def poly_schedule(
    base_lr: float, total_steps: int, power: float = 0.9
) -> optax.Schedule:
    """Polynomial decay ``lr * (1 - step/total)^power`` — the `--lr-mode poly`
    recipe of the upstream DRN trainer (the reference parses the flag at
    semantic_seg.py:696 but, like its upstream, defaults to step; we honor
    both choices)."""

    def sched(count):
        frac = 1.0 - jnp.minimum(count, total_steps) / total_steps
        return base_lr * frac ** power

    return sched


def step30_schedule(base_lr: float, steps_per_epoch: int) -> optax.Schedule:
    """lr * 0.1^(epoch//30) — the ImageNet-100-epoch rule
    (rmbsnn_main.py:603-604)."""

    def sched(count):
        epoch = count // steps_per_epoch
        return base_lr * (0.1 ** (epoch // 30))

    return sched


def make_sgd(
    schedule_or_lr,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """torch.optim.SGD-equivalent transformation chain."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(schedule_or_lr))
    return optax.chain(*parts)
