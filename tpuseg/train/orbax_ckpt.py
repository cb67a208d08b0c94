"""Orbax-backed checkpoint envelope (BACKLOG #8).

Same logical contract as the npz envelope (``tpuseg.train.checkpoint``:
params / bn_state / masks / opt / meta, matching the reference's
save_checkpoint fields, semantic_seg.py:286-290) stored through
``orbax.checkpoint`` instead of a single .npz file.  What orbax adds over
the npz envelope:

- **async save**: ``async_save=True`` returns while the write happens on a
  background thread (training continues; the next save waits for the
  previous one), the TPU-idiomatic answer to the reference's blocking
  ``torch.save``.
- **multi-host coordination**: under ``jax.distributed`` every process
  calls save with its (replicated) arrays and orbax elects the writer and
  barriers — no rank-0 guard needed (the reference guards by hand,
  rmbsnn_main.py:414-415).
- atomicity via orbax's write-then-commit directory protocol (same
  guarantee the npz envelope gets from write-tmp-then-rename).

Format selection is by path: ``save_checkpoint``/``load_checkpoint`` in
``tpuseg.train.checkpoint`` delegate here when the path ends in
``.orbax`` (a directory).  The flat array layout inside the checkpoint is
identical to the npz member names, so tooling that lists keys sees the
same names in both formats.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Mapping

import jax
import numpy as np


_ASYNC_CKPTR = None  # lazily-built singleton; owns the background thread


def _checkpointer(async_save: bool):
    import orbax.checkpoint as ocp

    global _ASYNC_CKPTR
    if async_save:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        return _ASYNC_CKPTR
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_checkpoint_orbax(
    path: str,
    params: Mapping[str, Any],
    bn_state: Mapping[str, Any],
    *,
    opt_state: Any = None,
    masks: Mapping[str, Any] | None = None,
    meta: Mapping[str, Any] | None = None,
    is_best: bool = False,
    async_save: bool = False,
) -> None:
    from tpuseg.train.checkpoint import _flatten

    arrays: dict[str, np.ndarray] = {}
    arrays.update(_flatten("params", dict(params)))
    arrays.update(_flatten("bn_state", dict(bn_state)))
    if masks:
        arrays.update(_flatten("masks", dict(masks)))
    if opt_state is not None:
        arrays.update(_flatten("opt", opt_state))
    # meta rides inside the tree as a uint8 blob (same trick as the npz
    # member) so the checkpoint stays a single orbax unit
    arrays["__meta__"] = np.frombuffer(
        json.dumps(dict(meta or {})).encode(), dtype=np.uint8
    ).copy()
    path = os.path.abspath(path)
    ckptr = _checkpointer(async_save)
    # every process calls save (orbax's commit protocol is collective),
    # but plain filesystem ops around it — replace-rmtree and the
    # best-copy — are rank-0-only, with a barrier so no process enters
    # orbax's save while the old tree is still being deleted
    is_primary = jax.process_index() == 0
    if os.path.exists(path):  # orbax refuses to overwrite; match npz replace
        if async_save:
            ckptr.wait_until_finished()
        if is_primary:
            shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tpuseg_ckpt_replace")
    ckptr.save(path, arrays)
    if is_best:
        if async_save:
            ckptr.wait_until_finished()
        if is_primary:
            best = os.path.join(
                os.path.dirname(path), "checkpoint_best.orbax")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)


def wait_for_saves() -> None:
    """Block until any outstanding async orbax save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint_orbax(path: str):
    """Returns (params, bn_state, masks, opt_arrays, meta) — the same tuple
    as ``tpuseg.train.checkpoint.load_checkpoint``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    blob = ckptr.restore(os.path.abspath(path))
    params, bn_state, masks, opt_arrays = {}, {}, {}, {}
    meta: dict[str, Any] = {}
    for key, val in blob.items():
        if key == "__meta__":
            meta = json.loads(np.asarray(val).tobytes().decode())
        elif key.startswith("params/"):
            params[key[len("params/"):]] = np.asarray(val)
        elif key.startswith("bn_state/"):
            bn_state[key[len("bn_state/"):]] = np.asarray(val)
        elif key.startswith("masks/"):
            masks[key[len("masks/"):]] = np.asarray(val)
        elif key.startswith("opt/"):
            opt_arrays[key[len("opt/"):]] = np.asarray(val)
    return params, bn_state, masks, opt_arrays, meta
