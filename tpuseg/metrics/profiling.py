"""Device-level tracing: the TPU-native replacement for the reference's
manual ``time.time()`` deltas and ``AverageMeter`` batch timing
(/root/reference/semantic_seg.py:168-226, rmbsnn_main.py:433-488,
tools/get_matrix_shapes.py hook-based FLOP extraction).

Two tools:

- :func:`trace`: context manager around ``jax.profiler.trace`` — captures a
  full XLA device trace (op-level timeline, HBM usage) viewable in
  TensorBoard or Perfetto.  Wired into the training loop and video CLI via
  ``--profile-dir``.
- :func:`cost_analysis`: analytical FLOPs/bytes for a jitted function at
  given example args from XLA's own cost model — the principled version of
  the reference's per-layer (M, K, N) shape hooks.
"""

from __future__ import annotations

import contextlib
from typing import Any


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler device trace into ``logdir`` (no-op if None).

    Usage::

        with profiling.trace(args.profile_dir):
            run_epoch(...)

    View with ``tensorboard --logdir <logdir>`` (Profile tab) or upload the
    ``.trace.json.gz`` under ``plugins/profile/`` to ui.perfetto.dev.
    """
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *example_args, **example_kwargs) -> dict[str, Any]:
    """XLA cost analysis of ``jit(fn)`` at the example arguments.

    Returns a dict with at least ``flops`` and ``bytes accessed`` when the
    backend provides them (the reference extracts per-layer FLOPs with
    forward hooks, tools/get_matrix_shapes.py:7-64; XLA computes this
    exactly from the optimized HLO).
    """
    import jax

    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    compiled = lowered.compile()
    analyses = compiled.cost_analysis()
    if analyses is None:
        return {}
    if isinstance(analyses, (list, tuple)):
        return dict(analyses[0]) if analyses else {}
    return dict(analyses)
