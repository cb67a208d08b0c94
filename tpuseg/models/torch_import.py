"""Import PyTorch ``.pth`` checkpoints into tpuseg flat param/state dicts.

Handles the reference's checkpoint-key quirks (cf. SURVEY.md §2.3):

- ``module.`` prefix from DataParallel/DDP wrapping (rmbsnn_main.py:184-190)
- ``base.`` vs ``layer.`` DRNSeg attribute naming (seg_video.py:70 vs
  semantic_seg.py:135; remap comments in seg_video_old.py:286-302)
- conv weights OIHW -> HWIO transpose (tpuseg stores TPU-friendly HWIO)
- the frozen upsampler ``up.weight`` (classes,1,16,16) -> a single (16,16)
  kernel (all channels are identical by construction, fill_up_weights)
- ``num_batches_tracked`` buffers are dropped
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def normalize_key(key: str) -> str:
    if key.startswith("module."):
        key = key[len("module.") :]
    if key.startswith("base."):
        key = "layer." + key[len("base.") :]
    return key


def convert_state_dict(
    sd: Mapping[str, Any], dtype=jnp.float32
) -> tuple[dict[str, jnp.ndarray], dict[str, jnp.ndarray]]:
    """Convert a torch state_dict (name -> tensor) to (params, state).

    Works for both DRN classifiers and DRNSeg checkpoints.
    """
    params: dict[str, jnp.ndarray] = {}
    state: dict[str, jnp.ndarray] = {}
    for raw_key, tensor in sd.items():
        key = normalize_key(raw_key)
        if key.endswith("num_batches_tracked"):
            continue
        arr = _to_numpy(tensor)
        if key.endswith("running_mean") or key.endswith("running_var"):
            state[key] = jnp.asarray(arr, dtype)
            continue
        if key == "up.weight":
            # (C, 1, k, k) depthwise transposed-conv weight; all channels equal.
            params[key] = jnp.asarray(arr[0, 0], dtype)
            continue
        if arr.ndim == 4:
            # OIHW -> HWIO
            arr = np.transpose(arr, (2, 3, 1, 0))
        params[key] = jnp.asarray(arr, dtype)
    return params, state


def load_pth(path: str, dtype=jnp.float32):
    """Load a ``.pth`` checkpoint file.  Accepts either a bare state_dict or
    the reference's checkpoint envelope ``{'state_dict': ..., 'epoch': ...}``
    (semantic_seg.py:286-290)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    meta: dict[str, Any] = {}
    if isinstance(blob, dict) and "state_dict" in blob:
        meta = {k: v for k, v in blob.items() if k != "state_dict"}
        sd = blob["state_dict"]
    else:
        sd = blob
    params, state = convert_state_dict(sd, dtype)
    return params, state, meta


def export_state_dict(params: Mapping[str, Any], state: Mapping[str, Any]) -> dict:
    """Inverse mapping: produce a torch-layout state_dict (numpy values) for
    interop/tooling.  Conv weights go back to OIHW."""
    out: dict[str, np.ndarray] = {}
    for key, val in params.items():
        arr = np.asarray(val)
        if key == "up.weight":
            continue  # synthesized on the torch side by fill_up_weights
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        out[key] = arr
    for key, val in state.items():
        out[key] = np.asarray(val)
    return out
