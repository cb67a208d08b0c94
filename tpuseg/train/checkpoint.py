"""Checkpoint save/resume.

Same contract as the reference (save_checkpoint envelope with epoch / arch /
state / best metric / optimizer, semantic_seg.py:286-290, resume at
:973-990) with one deliberate upgrade: **masks are checkpointed** — the
reference regenerates them per run, which is nondeterministic for
random-construction maskers (SURVEY.md §5).

Format: a single .npz holding the flattened pytrees (``params/<name>``,
``bn_state/<name>``, ``masks/<name>``, ``opt/<idx>/<name>``) plus a JSON
metadata blob.  Torch ``.pth`` checkpoints import via
tpuseg.models.torch_import.load_pth.

Paths ending in ``.orbax`` dispatch to the orbax envelope
(``tpuseg.train.orbax_ckpt``) — same tuple contract, plus async save and
multi-host write coordination.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Mapping

import numpy as np

import jax


def _flatten(prefix: str, tree) -> dict[str, np.ndarray]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "/" + "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def save_checkpoint(
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
    if path.endswith(".orbax"):
        from tpuseg.train.orbax_ckpt import save_checkpoint_orbax

        save_checkpoint_orbax(
            path, params, bn_state, opt_state=opt_state, masks=masks,
            meta=meta, is_best=is_best, async_save=async_save,
        )
        return
    arrays: dict[str, np.ndarray] = {}
    arrays.update(_flatten("params", dict(params)))
    arrays.update(_flatten("bn_state", dict(bn_state)))
    if masks:
        arrays.update(_flatten("masks", dict(masks)))
    if opt_state is not None:
        arrays.update(_flatten("opt", opt_state))
    arrays["__meta__"] = np.frombuffer(
        json.dumps(dict(meta or {})).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    if is_best:
        # best-copy alongside, like checkpoint_best.pth.tar (semantic_seg.py:290)
        shutil.copyfile(path, os.path.join(os.path.dirname(path) or ".", "checkpoint_best.npz"))


def load_checkpoint(path: str):
    """Returns (params, bn_state, masks, opt_arrays, meta).  ``opt_arrays``
    is the flat ``{path: array}`` dict — restore into a live opt_state with
    ``restore_opt_state``."""
    if path.endswith(".orbax"):
        from tpuseg.train.orbax_ckpt import load_checkpoint_orbax

        return load_checkpoint_orbax(path)
    blob = np.load(path, allow_pickle=False)
    params, bn_state, masks, opt_arrays = {}, {}, {}, {}
    meta: dict[str, Any] = {}
    for key in blob.files:
        if key == "__meta__":
            meta = json.loads(bytes(blob[key]).decode())
        elif key.startswith("params/"):
            params[key[len("params/") :]] = blob[key]
        elif key.startswith("bn_state/"):
            bn_state[key[len("bn_state/") :]] = blob[key]
        elif key.startswith("masks/"):
            masks[key[len("masks/") :]] = blob[key]
        elif key.startswith("opt/"):
            opt_arrays[key[len("opt/") :]] = blob[key]
    return params, bn_state, masks, opt_arrays, meta


def restore_opt_state(template_opt_state, opt_arrays: Mapping[str, np.ndarray]):
    """Fill a freshly-initialized opt_state pytree from saved flat arrays."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        template_opt_state
    )
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = "/".join(_path_str(p) for p in path)
        if key in opt_arrays:
            new_leaves.append(opt_arrays[key])
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
