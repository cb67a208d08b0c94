"""Inference-time BatchNorm folding.

At eval time BN is affine: y = (x - mu) * g / sqrt(v + eps) + b.  For a
conv (no bias) followed by BN this folds into the conv:

    W'[.., o] = W[.., o] * s[o],   b'[o] = b[o] - mu[o] * s[o],
    s = g / sqrt(v + eps)

Folding removes every normalization pass from the deployed graph (and the
associated f32 upcasts), which matters on the bandwidth-bound full-
resolution stages of DRN at 1024x2048.  The forward path detects folded
weights by the absence of BN params (tpuseg.models.drn._conv_maybe_bn).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from tpuseg.models.drn import BN_EPS, DrnSpec


def _fold_pair(params, state, out, cname, bname, eps=BN_EPS):
    w = np.asarray(params[f"{cname}.weight"], np.float32)
    g = np.asarray(params[f"{bname}.weight"], np.float32)
    b = np.asarray(params[f"{bname}.bias"], np.float32)
    mu = np.asarray(state[f"{bname}.running_mean"], np.float32)
    var = np.asarray(state[f"{bname}.running_var"], np.float32)
    s = g / np.sqrt(var + eps)
    out[f"{cname}.weight"] = w * s  # HWIO: broadcast over output channels
    out[f"{cname}.bias"] = b - mu * s


def fold_bn(params: Mapping, state: Mapping, spec: DrnSpec) -> dict:
    """Return a new param dict with every conv+BN pair folded (BN params
    removed; pair with an empty BN-state dict).  Inference only."""
    out = {k: np.asarray(v) for k, v in params.items()}
    folded_bns = []
    for _, stage in spec.stages:
        if stage.kind == "convs":
            pairs = list(stage.convs)
        else:
            pairs = []
            for blk in stage.blocks:
                pairs.extend(zip(blk.convs, blk.bns))
                if blk.downsample is not None:
                    pairs.append(blk.downsample)
        for cdef, bdef in pairs:
            _fold_pair(params, state, out, cdef.name, bdef.name)
            folded_bns.append(bdef.name)
    for bn in folded_bns:
        out.pop(bn + ".weight", None)
        out.pop(bn + ".bias", None)
    return out
