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


# Published ImageNet-pretrained DRN backbone checkpoints
# (/root/reference/drn.py:13-24: every reference seg trainer builds its
# backbone with pretrained=True, which model_zoo-downloads one of these).
DRN_WEBROOT = "http://dl.yf.io/drn/"
DRN_MODEL_URLS = {
    "drn_c_26": DRN_WEBROOT + "drn_c_26-ddedf421.pth",
    "drn_c_42": DRN_WEBROOT + "drn_c_42-9d336e8c.pth",
    "drn_c_58": DRN_WEBROOT + "drn_c_58-0a53a92c.pth",
    "drn_d_22": DRN_WEBROOT + "drn_d_22-4bd2f8ea.pth",
    "drn_d_38": DRN_WEBROOT + "drn_d_38-eebb45f0.pth",
    "drn_d_54": DRN_WEBROOT + "drn_d_54-0e0534ff.pth",
    "drn_d_105": DRN_WEBROOT + "drn_d_105-12b40979.pth",
}

# head tensors never transplanted from a classifier checkpoint: the fc
# head is ImageNet-specific and DRNSeg replaces it with seg/up
_BACKBONE_EXCLUDE = ("fc.", "seg.", "up.")


def _cache_dir() -> str:
    import os

    return os.environ.get(
        "TPUSEG_CACHE", os.path.expanduser("~/.cache/tpuseg"))


def resolve_backbone_source(src: str, arch: str) -> str:
    """``auto`` -> the arch's published URL; anything else passes through."""
    if src != "auto":
        return src
    if arch not in DRN_MODEL_URLS:
        raise ValueError(
            f"no published pretrained backbone for {arch!r}; "
            f"have {sorted(DRN_MODEL_URLS)}")
    return DRN_MODEL_URLS[arch]


def fetch_backbone(src: str, cache_dir: str | None = None) -> str:
    """Return a local path for ``src`` (path or URL).

    URLs resolve through the cache directory (``$TPUSEG_CACHE`` or
    ``~/.cache/tpuseg``) keyed by basename — the moral equivalent of
    torch model_zoo's cache (drn.py:15).  A download is attempted only on
    cache miss; on a network-blocked machine, pre-place the file in the
    cache (or pass a local path) and no network is touched.
    """
    import os

    if not src.startswith(("http://", "https://")):
        return src
    cache = cache_dir or _cache_dir()
    local = os.path.join(cache, os.path.basename(src))
    if os.path.exists(local):
        return local
    os.makedirs(cache, exist_ok=True)
    import urllib.request

    try:
        tmp = local + ".part"
        urllib.request.urlretrieve(src, tmp)
        os.replace(tmp, local)
    except Exception as exc:
        raise RuntimeError(
            f"could not download pretrained backbone {src!r} ({exc}); "
            f"place the file at {local!r} or pass a local .pth path"
        ) from exc
    return local


def _cls_to_seg_key(key: str) -> str:
    """Classifier-DRN keys (``layer3.0.conv1.weight``, torch attribute
    naming) -> DRNSeg-Sequential keys (``layer.3.0.conv1.weight``).  The
    published pretrained checkpoints are classifiers, so this remap is what
    makes them loadable into a seg-named model."""
    import re

    return re.sub(r"^layer(\d+)\.", r"layer.\1.", key)


def load_pretrained_backbone(
    arch: str,
    src: str,
    params: dict,
    state: dict,
    dtype=jnp.float32,
    cache_dir: str | None = None,
) -> tuple[dict, dict, int]:
    """Fill a freshly-initialized DRNSeg param/state dict's BACKBONE from an
    ImageNet-pretrained DRN classifier checkpoint, keeping the seg/up head
    at its init — the reference's ``pretrained=True`` bootstrap contract
    (drn.py:15-24 via semantic_seg.py:127-134; every reference seg trainer
    runs it at :568/:801).

    ``src``: local ``.pth`` path, ``http(s)`` URL (cache-resolved), or
    ``"auto"`` (the arch's published URL).  Returns
    ``(params, state, n_transplanted)``; shapes are checked per tensor and
    a mismatch raises (wrong-arch checkpoint).
    """
    path = fetch_backbone(resolve_backbone_source(src, arch), cache_dir)
    bb_params, bb_state, _ = load_pth(path, dtype)
    out_p, out_s = dict(params), dict(state)
    # the published backbones are CLASSIFIER checkpoints (torch keys
    # ``layer3.0.conv1.weight``); remap to seg naming when the destination
    # model is seg-named (``layer.3...``) — seg-sourced keys pass through
    seg_dest = any(k.startswith("layer.") for k in params)
    n = 0
    for source, dest in ((bb_params, out_p), (bb_state, out_s)):
        for key, val in source.items():
            if key.startswith(_BACKBONE_EXCLUDE):
                continue
            if seg_dest and key not in dest:
                key = _cls_to_seg_key(key)
            if key not in dest:
                raise KeyError(
                    f"pretrained backbone tensor {key!r} has no slot in "
                    f"{arch}; wrong checkpoint for this arch?")
            if tuple(np.shape(dest[key])) != tuple(np.shape(val)):
                raise ValueError(
                    f"pretrained backbone {key!r} shape "
                    f"{np.shape(val)} != model's {np.shape(dest[key])}")
            dest[key] = val
            n += 1
    return out_p, out_s, n


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
