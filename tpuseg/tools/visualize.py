"""Mask / layer visualization.

Parity with /root/reference/tools/visualize_layers.py:8-62 — per-layer
block-mask imshow.  Writes PNGs (headless) instead of plt.show().
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from tpuseg.sparsity.base import hwio_to_oihw


def visualize_layer_masks(
    params: Mapping[str, np.ndarray],
    out_dir: str,
    max_layers: int | None = None,
) -> list[str]:
    """Render each sparse conv/FC layer's nonzero pattern to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []
    count = 0
    for name, v in params.items():
        arr = np.asarray(v)
        if arr.ndim not in (2, 4) or name == "up.weight":
            continue
        w = hwio_to_oihw(arr)
        mat = w.reshape(w.shape[0], -1)
        sp = 1.0 - np.count_nonzero(mat) / mat.size
        if sp <= 0:
            continue
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(mat != 0, cmap="gray", aspect="auto", interpolation="nearest")
        ax.set_title(f"{name}  sparsity={sp * 100:.1f}%")
        path = os.path.join(out_dir, name.replace("/", "_") + ".png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
        count += 1
        if max_layers is not None and count >= max_layers:
            break
    return written


def main(argv=None):
    import argparse

    from tpuseg.train import load_checkpoint

    p = argparse.ArgumentParser(description="visualize sparse layer masks")
    p.add_argument("checkpoint")
    p.add_argument("--out-dir", default="layer_viz")
    p.add_argument("--max-layers", type=int, default=None)
    args = p.parse_args(argv)
    params, _, masks, _, _ = load_checkpoint(args.checkpoint)
    if masks:
        from tpuseg.sparsity import apply_masks

        params = apply_masks(params, masks)
    paths = visualize_layer_masks(params, args.out_dir, args.max_layers)
    print(f"wrote {len(paths)} images to {args.out_dir}")


if __name__ == "__main__":
    main()
