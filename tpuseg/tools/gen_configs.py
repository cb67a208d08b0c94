"""Generate tpuseg's vendored RBGP config set (``optimal_configs/`` at the
repo root).

The reference ships 12 tuned srmbrep configs
(``/root/reference/optimal_configs/{drn_d_22,drn_d_54}/
<arch>_<H>X<W>_0.00_<SP>.json``) whose per-layer entries carry both the mask
geometry AND CUDA-kernel build parameters (``make_kwargs``/``exec_args`` —
TBT tile shapes, shmem defines, launch args) produced by their GPU
autotuner.  tpuseg consumes the mask-geometry half of that schema verbatim
(tpuseg.sparsity.srmbrep) but needs none of the kernel-tuning half: the
serving kernels plan themselves from the realized mask at load time
(tpuseg.models.sparse_exec.build_sparse_plans), so a tpuseg config is pure
mask geometry.

This module regenerates the full (arch x resolution x sparsity) matrix the
reference covers, from tpuseg's own sweeper geometry policy
(tpuseg.cli.expander_batch.generate_rbgp_config): uniform
outer/core/inner block sizes clamped per layer, RAMANUJAN patterns at
osp=0 (no outer pruning), matching the reference's fixed choices
(expander_batch.py:184-190).  Two deliberate differences, both TPU-first:

- files for different input resolutions have identical content: the mask
  geometry does not depend on the input resolution — the reference's
  per-resolution variation tunes CUDA launch geometry, which tpuseg
  derives from the mask itself at plan-build time.  The per-resolution
  names are kept so reference-style paths drop in unchanged.
- inner blocklets are 2x2 wherever the core-block grid admits them
  (>= 2 blocklets per axis), else 1x1 — the reference mixes 1x1/2x2 per
  layer by autotuner outcome; on TPU the serving plans coarsen to MXU
  block granularity either way (tpuseg.ops.rbgp_matmul docstring), so the
  choice is accuracy-side only and 2x2 is the reference's own majority
  pick at 50%.

Regenerate with:  python -m tpuseg.tools.gen_configs [--out optimal_configs]
The output is deterministic (geometry only — no RNG), so the vendored
files are stable across runs.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# (arch, "HxW" resolution tag, inner sparsity) — the reference's shipped
# matrix, /root/reference/optimal_configs/*/
MATRIX: list[tuple[str, str, float]] = [
    ("drn_d_22", "64X128", 0.50),
    ("drn_d_22", "224X224", 0.50),
    ("drn_d_22", "512X256", 0.50),
    ("drn_d_22", "512X256", 0.75),
    ("drn_d_22", "512X512", 0.50),
    ("drn_d_22", "512X512", 0.75),
    ("drn_d_22", "1024X768", 0.50),
    ("drn_d_22", "1024X768", 0.75),
    ("drn_d_22", "1024X768", 0.875),
    ("drn_d_54", "512X512", 0.50),
    ("drn_d_54", "512X512", 0.75),
    ("drn_d_54", "1024X768", 0.50),
    # beyond the reference's shipped set: the reference vendors a
    # drn_d_38 accuracy checkpoint (.MISSING_LARGE_BLOBS) but no d38
    # sparse configs; tpuseg covers the arch so the compression research
    # loop (tools/trained_fidelity --stage compress) runs on it too
    ("drn_d_38", "512X512", 0.50),
]


def config_filename(arch: str, res: str, isp: float) -> str:
    # reference naming: <arch>_<H>X<W>_<osp%>_<isp%>.json with 2 decimals
    return f"{arch}_{res}_0.00_{100 * isp:.2f}.json"


def emit_optimal_configs(out_root: str, matrix=None, verbose: bool = True
                         ) -> list[str]:
    """Write the vendored config matrix under ``out_root/<arch>/``.

    Returns the list of written paths.  Model params are initialized once
    per arch (geometry depends only on layer shapes)."""
    import jax

    from tpuseg.cli.expander_batch import generate_rbgp_config
    from tpuseg.models import init_drnseg

    matrix = MATRIX if matrix is None else matrix

    written = []
    params_by_arch: dict[str, dict] = {}
    for arch, res, isp in matrix:
        if arch not in params_by_arch:
            params_by_arch[arch], _, _ = init_drnseg(
                jax.random.key(0), arch, 19)
        cfg = generate_rbgp_config(
            params_by_arch[arch], arch,
            oblock=(64, 32), cblock=(32, 32), iblock=(2, 2),
            osp=0.0, isp=isp,
        )
        d = os.path.join(out_root, arch)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, config_filename(arch, res, isp))
        with open(path, "w") as fh:
            json.dump(cfg, fh, indent=4)
            fh.write("\n")
        if verbose:
            print(f"wrote {path} ({len(cfg['configs'])} layers, isp={isp})")
        written.append(path)
    return written


# Serving-grade block configs (tpuseg-native, no reference counterpart):
# 128x128 channel-block masks (pruner_type "block", BlockPruner semantics)
# on every /128-divisible conv — the geometry the sparse serving lowerings
# (gathered / fused Pallas, tpuseg.models.sparse_exec) execute at full
# MXU-block granularity.  The fine-grained srmbrep set above is the
# reference's accuracy-research geometry (2x2 blocklets — below MXU tile
# granularity, served masked-dense by measured physics); THIS set is what
# `seg_video --pr-config-path ... --sparse-lowering gathered` serves at
# 1.60x bf16 / 1.66x int8 model-level (round-4 hardware record; the
# exact-supports default refines it — docs/PERF_NOTES.md density sweep).
SERVING_MATRIX: list[tuple[str, float]] = [
    ("drn_d_22", 0.50),
    ("drn_d_22", 0.75),
    ("drn_d_22", 0.875),
    ("drn_d_38", 0.875),
    ("drn_d_54", 0.875),
]


def emit_serving_configs(out_root: str, matrix=None, verbose: bool = True
                         ) -> list[str]:
    """Write MXU-block serving configs under ``out_root/<arch>/``."""
    import jax

    from tpuseg.models import init_drnseg
    from tpuseg.sparsity.base import hwio_to_oihw

    matrix = SERVING_MATRIX if matrix is None else matrix
    written = []
    params_by_arch: dict[str, dict] = {}
    for arch, sp in matrix:
        if arch not in params_by_arch:
            params_by_arch[arch], _, _ = init_drnseg(
                jax.random.key(0), arch, 19)
        layers = []
        for name, v in params_by_arch[arch].items():
            arr = np.asarray(v) if not hasattr(v, "shape") else v
            if getattr(arr, "ndim", 0) != 4 or name == "up.weight":
                continue
            w = hwio_to_oihw(np.asarray(arr))
            if w.shape[0] % 128 or w.shape[1] % 128:
                continue
            # single-block layers are degenerate under BlockPruner's
            # strict-threshold semantics (thresh = the block's own sum,
            # keep strictly above -> the WHOLE layer is zeroed at any
            # sparsity > 0; reference parity, BlockPruner.py:190-207) —
            # exclude them so the serving configs never kill a layer
            if (w.shape[0] // 128) * (w.shape[1] // 128) < 2:
                continue
            layers.append(name)
        cfg = {
            "pruner_type": "block",
            "configs": [
                {
                    "layer_set": layers,
                    "sparsity": sp,
                    "block_height": 128,
                    "block_width": 128,
                    "sub_rows": -1,
                    "sub_cols": -1,
                    "collapse_tensor": False,
                }
            ],
        }
        d = os.path.join(out_root, arch)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{arch}_block128_{100 * sp:.2f}.json")
        with open(path, "w") as fh:
            json.dump(cfg, fh, indent=4)
            fh.write("\n")
        if verbose:
            print(f"wrote {path} ({len(layers)} layers, sparsity={sp})")
        written.append(path)
    return written


# Block-REGULAR serving configs (tpuseg-native, block-level N:M —
# tpuseg.sparsity.block_regular): per out-block top-k in-blocks, so every
# layer and every 128-output block keeps at least one live in-block at ANY
# sparsity.  The plain block128 set above is the raw BlockPruner geometry
# (reference semantics), whose strict per-layer threshold ZEROES whole
# small layers at 87.5% (all of DRN-D-22's stage 5 — PERF_NOTES round-4
# cont.): maximal speed (dead layers are free under the exact gathered
# lowering), minimal at-mask accuracy.  This regular set is the
# fidelity-preserving point on the same axis: uniform supports, no dead
# channels, served by the same lowerings.  Covers ALL /128 layers
# (single-block layers keep their one block and stay dense — harmless).
REGULAR_MATRIX: list[tuple[str, float]] = [
    ("drn_d_22", 0.50),
    ("drn_d_22", 0.75),
    ("drn_d_22", 0.875),
    ("drn_d_38", 0.875),
    ("drn_d_54", 0.875),
]


def emit_regular_configs(out_root: str, matrix=None, verbose: bool = True
                         ) -> list[str]:
    """Write block-regular (block-level N:M) serving configs."""
    import jax

    from tpuseg.models import init_drnseg
    from tpuseg.sparsity.base import hwio_to_oihw

    matrix = REGULAR_MATRIX if matrix is None else matrix
    written = []
    params_by_arch: dict[str, dict] = {}
    for arch, sp in matrix:
        if arch not in params_by_arch:
            params_by_arch[arch], _, _ = init_drnseg(
                jax.random.key(0), arch, 19)
        layers = []
        for name, v in params_by_arch[arch].items():
            arr = np.asarray(v) if not hasattr(v, "shape") else v
            if getattr(arr, "ndim", 0) != 4 or name == "up.weight":
                continue
            w = hwio_to_oihw(np.asarray(arr))
            if w.shape[0] % 128 or w.shape[1] % 128:
                continue
            layers.append(name)
        cfg = {
            "pruner_type": "block_regular",
            "configs": [
                {
                    "layer_set": layers,
                    "sparsity": sp,
                    "block_height": 128,
                    "block_width": 128,
                }
            ],
        }
        d = os.path.join(out_root, arch)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{arch}_block128reg_{100 * sp:.2f}.json")
        with open(path, "w") as fh:
            json.dump(cfg, fh, indent=4)
            fh.write("\n")
        if verbose:
            print(f"wrote {path} ({len(layers)} layers, sparsity={sp})")
        written.append(path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(
        description="regenerate the vendored optimal_configs/ set")
    p.add_argument("--out", default="optimal_configs")
    args = p.parse_args(argv)
    # geometry needs only layer shapes — force the local CPU backend (the
    # axon relay pins jax_platforms at boot, overriding JAX_PLATFORMS; a
    # relay outage would otherwise hang a pure-geometry tool)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    emit_optimal_configs(args.out)
    emit_serving_configs(args.out)
    emit_regular_configs(args.out)


if __name__ == "__main__":
    main()
