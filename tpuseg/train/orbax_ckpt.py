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
- atomicity via orbax's write-then-commit directory protocol, PLUS a
  sibling-path swap at this layer: the save lands in ``<path>.new`` and is
  only renamed over ``<path>`` after orbax commits (for async saves, after
  ``wait_until_finished``).  The previous checkpoint is never deleted
  before its replacement is durable — the same guarantee the npz envelope
  gets from write-tmp-then-rename, now across the whole async window.
  ``load_checkpoint_orbax`` accepts the committed ``.new``/`.old`` siblings
  a crash between the two renames can leave behind.

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
_PENDING_SWAP = None  # (tmp, final) of an async save awaiting commit+swap


def _checkpointer(async_save: bool):
    import orbax.checkpoint as ocp

    global _ASYNC_CKPTR
    if async_save:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        return _ASYNC_CKPTR
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _is_committed(path: str) -> bool:
    """True iff ``path`` is a checkpoint directory orbax finished committing
    (uncommitted saves live at ``*.orbax-checkpoint-tmp-*`` siblings or carry
    a tmp marker, depending on the protocol orbax picked for the FS)."""
    import orbax.checkpoint.utils as ocp_utils

    try:
        # Under the rename protocol any final-named dir is "finalized", so
        # also require orbax's metadata marker — an empty/foreign dir at the
        # sibling path must read as NOT committed (and get cleaned).
        return (
            os.path.isdir(path)
            and os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
            and bool(ocp_utils.is_checkpoint_finalized(path))
        )
    except (OSError, ValueError):
        return False


def _rename_over(tmp: str, final: str) -> None:
    """Plain-filesystem rename of a COMMITTED save at ``tmp`` over ``final``
    (caller must be rank 0; no collectives inside).

    The old checkpoint is moved aside (``<final>.old``) rather than deleted
    first, so a crash at any point leaves at least one durable checkpoint:
    either ``final`` (old or new) or a committed ``tmp`` that
    ``load_checkpoint_orbax`` falls back to.
    """
    old = final + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(tmp, final)
    if os.path.exists(old):
        shutil.rmtree(old)


def _swap_into_place(tmp: str, final: str) -> None:
    if jax.process_index() == 0:
        _rename_over(tmp, final)
    _barrier("tpuseg_ckpt_swap")


def _finalize_pending() -> None:
    global _PENDING_SWAP
    if _PENDING_SWAP is None:
        return
    tmp, final = _PENDING_SWAP
    _PENDING_SWAP = None
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _swap_into_place(tmp, final)


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
    global _PENDING_SWAP
    path = os.path.abspath(path)
    ckptr = _checkpointer(async_save)
    # Finish (wait + swap) any outstanding async save before starting the
    # next one — AsyncCheckpointer requires it, and it keeps at most one
    # .new sibling alive at a time.
    _finalize_pending()
    # every process calls save (orbax's commit protocol is collective),
    # but plain filesystem ops around it — stale-sibling cleanup, the
    # swap, and the best-copy — are rank-0-only, with barriers so no
    # process races the filesystem ops
    is_primary = jax.process_index() == 0
    tmp = path + ".new"
    if is_primary:
        if _is_committed(tmp):
            # A crash landed between orbax's commit and our swap: the
            # ``.new`` sibling is the NEWEST durable checkpoint.  Rescue it
            # (swap it over ``path``) instead of deleting it.
            _rename_over(tmp, path)
        elif os.path.exists(tmp):
            # stale UNCOMMITTED sibling from a crashed earlier save
            shutil.rmtree(tmp)
        # uncommitted orbax scratch dirs from crashed saves (rename
        # protocol): ``<tmp>.orbax-checkpoint-tmp-<ts>``
        import glob

        for scratch in glob.glob(tmp + ".orbax-checkpoint-tmp-*"):
            shutil.rmtree(scratch, ignore_errors=True)
    # Unconditional: every rank joins regardless of the filesystem state it
    # observed (a conditional barrier deadlocks when ranks disagree about
    # whether the stale sibling existed).
    _barrier("tpuseg_ckpt_clean")
    # The save lands beside the live checkpoint; ``path`` keeps serving the
    # previous save until the new one has COMMITTED (async: until
    # wait_until_finished).  A crash anywhere in the async window loses
    # only the in-flight save, never the previous checkpoint.
    ckptr.save(tmp, arrays)
    if async_save:
        _PENDING_SWAP = (tmp, path)
    else:
        _swap_into_place(tmp, path)
    if is_best:
        _finalize_pending()  # async: commit + swap before copying
        if is_primary:
            best = os.path.join(
                os.path.dirname(path), "checkpoint_best.orbax")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
        _barrier("tpuseg_ckpt_best")


def wait_for_saves() -> None:
    """Block until any outstanding async orbax save has committed AND been
    swapped into place at its final path."""
    _finalize_pending()
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint_orbax(path: str):
    """Returns (params, bn_state, masks, opt_arrays, meta) — the same tuple
    as ``tpuseg.train.checkpoint.load_checkpoint``.

    Falls back to the committed ``<path>.new`` / ``<path>.old`` siblings a
    crash between the swap renames can leave behind (see
    ``save_checkpoint_orbax``).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # A committed ``.new`` is strictly newer than ``path`` (saves finalize
    # the pending swap before starting the next one), so prefer it: a crash
    # between orbax's commit and the swap must not silently roll back.
    if _is_committed(path + ".new"):
        path = path + ".new"
    elif not os.path.exists(path):
        for sibling in (path + ".new", path + ".old"):
            if os.path.exists(sibling):
                path = sibling
                break
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    blob = ckptr.restore(path)
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
