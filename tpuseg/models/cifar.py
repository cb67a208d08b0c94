"""CIFAR/ImageNet classifier zoo (parity with /root/reference/lmodels/).

Families and their behavioral references:
- ``cresnet``  — scratch CIFAR ResNets incl. pre-activation variants
  (lmodels/cifar_resnet.py): cifar_resnet20/32/44/56/110/1202/164/1001,
  cifar_preact_resnet20/110/164/1001
- ``tvresnet`` — torchvision-style ResNets with a 3x3 stride-1 CIFAR stem
  (lmodels/resnet_cifar.py): cifar_resnet18/34/50/101/152,
  cifar_resnext50_32x4d/101_32x8d, cifar_wide_resnet50_2/101_2
- ``vgg``      — Cifar_VGG incl. reduced rvgg channel configs
  (lmodels/cifar_vgg.py): cifar_vgg11/13/16/19(_bn), cifar_rvgg11_*_bn
- ``rvgg``     — residual VGG (lmodels/cifar_rvgg.py): cifar_res_rvgg11_*_bn
- ``wrn``      — Wide ResNet (lmodels/cifar_wrn.py): cifar_wrn_16_4/16_10/
  28_10/40_4

Same flat torch-style param naming as the DRN module, so pruner configs and
``.pth`` state_dicts key straight in.  Linear weights are stored in torch
(out, in) layout — the maskers collapse on dim 0, which must be OFM.

Dropout (rvgg classifier, wrn blocks with rate 0) is identity here: every
shipped config runs rate 0, and the reference evaluates in eval mode.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.drn import (
    BN_MOMENTUM,
    Params,
    State,
    batch_norm,
    conv2d,
    rng_from_key,
)

VGG_CFGS = {
    "R64": [64, "M", 64, "M", 64, 64, "M", 64, 64, "M", 64, 64],
    "R128": [128, "M", 128, "M", 128, 128, "M", 128, 128, "M", 128, 128],
    "R256": [256, "M", 256, "M", 256, 256, "M", 256, 256, "M", 256, 256],
    "R512": [512, "M", 512, "M", 512, 512, "M", 512, 512, "M", 512, 512],
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
          512, "M", 512, 512, 512, 512],
}

RVGG_CFGS = {
    k: v + ["M"] for k, v in VGG_CFGS.items() if k.startswith("R")
}


@dataclasses.dataclass(frozen=True)
class CifarSpec:
    family: str  # cresnet | tvresnet | vgg | rvgg | wrn
    arch: str
    num_classes: int
    block: str = "basic"  # basic | bottleneck | preact | preact_bottleneck
    layers: tuple[int, ...] = ()
    vgg_cfg: str = ""
    vgg_bn: bool = False
    rvgg_res: bool = False
    fmaps: int = 512
    groups: int = 1
    width_per_group: int = 64
    widen: int = 1


_CRESNET = {
    "cifar_resnet20": ("basic", 3), "cifar_resnet32": ("basic", 5),
    "cifar_resnet44": ("basic", 7), "cifar_resnet56": ("basic", 9),
    "cifar_resnet110": ("basic", 18), "cifar_resnet1202": ("basic", 200),
    "cifar_resnet164": ("bottleneck", 18), "cifar_resnet1001": ("bottleneck", 111),
    "cifar_preact_resnet20": ("preact", 3), "cifar_preact_resnet110": ("preact", 18),
    "cifar_preact_resnet164": ("preact_bottleneck", 18),
    "cifar_preact_resnet1001": ("preact_bottleneck", 111),
}

_TVRESNET = {
    "cifar_resnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "cifar_resnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "cifar_resnet50": ("bottleneck", (3, 4, 6, 3), 1, 64),
    "cifar_resnet101": ("bottleneck", (3, 4, 23, 3), 1, 64),
    "cifar_resnet152": ("bottleneck", (3, 8, 36, 3), 1, 64),
    "cifar_resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
    "cifar_resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 32, 8),
    "cifar_wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 1, 128),
    "cifar_wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), 1, 128),
}

_VGG = {
    "cifar_vgg11": ("A", False), "cifar_vgg11_bn": ("A", True),
    "cifar_vgg13": ("B", False), "cifar_vgg13_bn": ("B", True),
    "cifar_vgg16": ("D", False), "cifar_vgg16_bn": ("D", True),
    "cifar_vgg19": ("E", False), "cifar_vgg19_bn": ("E", True),
    "cifar_rvgg11_64_bn": ("R64", True), "cifar_rvgg11_128_bn": ("R128", True),
    "cifar_rvgg11_256_bn": ("R256", True), "cifar_rvgg11_512_bn": ("R512", True),
}

_RVGG = {
    "cifar_res_rvgg11_64_bn": "R64", "cifar_res_rvgg11_128_bn": "R128",
    "cifar_res_rvgg11_256_bn": "R256", "cifar_res_rvgg11_512_bn": "R512",
}

_WRN = {
    "cifar_wrn_16_4": (16, 4), "cifar_wrn_16_10": (16, 10),
    "cifar_wrn_28_10": (28, 10), "cifar_wrn_40_4": (40, 4),
}

CIFAR_ARCHS = (
    list(_CRESNET) + list(_TVRESNET) + list(_VGG) + list(_RVGG) + list(_WRN)
)


def build_cifar_spec(arch: str, num_classes: int) -> CifarSpec:
    if arch in _CRESNET:
        block, n = _CRESNET[arch]
        return CifarSpec("cresnet", arch, num_classes, block, (n, n, n))
    if arch in _TVRESNET:
        block, layers, groups, wpg = _TVRESNET[arch]
        return CifarSpec(
            "tvresnet", arch, num_classes, block, layers,
            groups=groups, width_per_group=wpg,
        )
    if arch in _VGG:
        cfg, bn = _VGG[arch]
        fmaps = VGG_CFGS[cfg][0] if cfg.startswith("R") else 512
        return CifarSpec("vgg", arch, num_classes, vgg_cfg=cfg, vgg_bn=bn, fmaps=fmaps)
    if arch in _RVGG:
        cfg = _RVGG[arch]
        return CifarSpec(
            "rvgg", arch, num_classes, vgg_cfg=cfg, vgg_bn=True,
            rvgg_res=True, fmaps=RVGG_CFGS[cfg][0],
        )
    if arch in _WRN:
        depth, k = _WRN[arch]
        n = (depth - 4) // 6
        return CifarSpec("wrn", arch, num_classes, layers=(n, n, n), widen=k)
    raise ValueError(f"unknown CIFAR arch {arch!r}")


# --------------------------------------------------------------------------
# init helpers (host numpy)
# --------------------------------------------------------------------------


class _Init:
    def __init__(self, rng: np.random.Generator, params: Params, state: State):
        self.rng, self.params, self.state = rng, params, state

    def conv(self, name, cin, cout, k, bias=False, init="he_out"):
        n = k * k * cout
        if init == "he_out":
            w = self.rng.normal(0, math.sqrt(2.0 / n), size=(k, k, cin, cout))
        else:  # xavier-ish for wrn
            fan = k * k * (cin + cout) / 2
            w = self.rng.normal(0, math.sqrt(2.0 / fan), size=(k, k, cin, cout))
        self.params[f"{name}.weight"] = w.astype(np.float32)
        if bias:
            self.params[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def bn(self, name, c):
        self.params[f"{name}.weight"] = np.ones((c,), np.float32)
        self.params[f"{name}.bias"] = np.zeros((c,), np.float32)
        self.state[f"{name}.running_mean"] = np.zeros((c,), np.float32)
        self.state[f"{name}.running_var"] = np.ones((c,), np.float32)

    def linear(self, name, cin, cout):
        self.params[f"{name}.weight"] = self.rng.normal(
            0, 0.01, size=(cout, cin)
        ).astype(np.float32)
        self.params[f"{name}.bias"] = np.zeros((cout,), np.float32)


def linear(x, params, name, compute_dtype=None):
    w = params[f"{name}.weight"]  # torch (out, in) layout
    b = params[f"{name}.bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return x @ w.T + b.astype(x.dtype)


def _pconv(plans, params, cname, x, stride, dilation, padding, cd, groups=1):
    """Plan-aware conv for the classifier zoo — the same per-layer
    exec-plan dispatch the DRN serving path uses (drn._conv_maybe_bn):
    a conv named in ``plans`` (int8 QuantConv, sparse exec plan, ...)
    executes via its plan; others run the plain XLA conv.  Plans only
    apply at stride-1/ungrouped call sites (a plan bakes stride 1)."""
    plan = (plans or {}).get(cname)
    if plan is not None and stride == 1 and groups == 1:
        out_dtype = x.dtype if cd is None else cd
        return plan.apply(x).astype(out_dtype)
    return conv2d(
        x, params[f"{cname}.weight"], stride, dilation, padding, cd,
        groups=groups,
    )


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _global_avgpool(x):
    return x.mean(axis=(1, 2))


# --------------------------------------------------------------------------
# family: cresnet (scratch CIFAR resnets)
# --------------------------------------------------------------------------


def _init_cresnet(spec: CifarSpec, I: _Init):
    exp = 4 if "bottleneck" in spec.block else 1
    preact = spec.block.startswith("preact")
    I.conv("conv1", 3, 16, 3)
    if not preact:
        I.bn("bn1", 16)
    inp = 16
    for g, planes in enumerate([16, 32, 64], start=1):
        stride = 1 if g == 1 else 2
        for b in range(spec.layers[g - 1]):
            name = f"layer{g}.{b}"
            s = stride if b == 0 else 1
            if b == 0 and (s != 1 or inp != planes * exp):
                I.conv(f"{name}.downsample.0", inp, planes * exp, 1)
                I.bn(f"{name}.downsample.1", planes * exp)
            if "bottleneck" in spec.block:
                if preact:
                    I.bn(f"{name}.bn1", inp)
                    I.conv(f"{name}.conv1", inp, planes, 1)
                    I.bn(f"{name}.bn2", planes)
                    I.conv(f"{name}.conv2", planes, planes, 3)
                    I.bn(f"{name}.bn3", planes)
                    I.conv(f"{name}.conv3", planes, planes * 4, 1)
                else:
                    I.conv(f"{name}.conv1", inp, planes, 1)
                    I.bn(f"{name}.bn1", planes)
                    I.conv(f"{name}.conv2", planes, planes, 3)
                    I.bn(f"{name}.bn2", planes)
                    I.conv(f"{name}.conv3", planes, planes * 4, 1)
                    I.bn(f"{name}.bn3", planes * 4)
            else:
                if preact:
                    I.bn(f"{name}.bn1", inp)
                    I.conv(f"{name}.conv1", inp, planes, 3)
                    I.bn(f"{name}.bn2", planes)
                    I.conv(f"{name}.conv2", planes, planes, 3)
                else:
                    I.conv(f"{name}.conv1", inp, planes, 3)
                    I.bn(f"{name}.bn1", planes)
                    I.conv(f"{name}.conv2", planes, planes, 3)
                    I.bn(f"{name}.bn2", planes)
            inp = planes * exp
    if preact:
        I.bn("bn", 64 * exp)
    I.linear("fc", 64 * exp, spec.num_classes)


def _group(upd, remat, fn, params, state, x):
    """Run one stage-group ``fn(params, state, x) -> (x, group_updates)``,
    optionally under ``jax.checkpoint``, merging its BN updates into
    ``upd``.  The group functions are pure (local update dicts) exactly so
    they can be checkpointed — the classifier-side mirror of the DRN
    backbone's per-stage remat (models/drn.py::drn_forward)."""
    if remat:
        fn = jax.checkpoint(fn)
    x, gupd = fn(params, state, x)
    upd.update(gupd)
    return x


def _fwd_cresnet(params, state, x, spec, train, cd, upd, plans=None,
                 remat=False):
    preact = spec.block.startswith("preact")
    x = _pconv(plans, params, "conv1", x, 1, 1, 1, cd)
    if not preact:
        x = batch_norm(x, params, state, upd, "bn1", train)
        x = jax.nn.relu(x)

    def group_fn(params, state, x, g, stride):
        upd: State = {}
        for b in range(spec.layers[g - 1]):
            name = f"layer{g}.{b}"
            s = stride if b == 0 else 1
            has_ds = f"{name}.downsample.0.weight" in params
            if preact:
                out = batch_norm(x, params, state, upd, f"{name}.bn1", train)
                out = jax.nn.relu(out)
                residual = x
                if has_ds:
                    residual = _pconv(plans, params, f"{name}.downsample.0", out, s, 1, 0, cd)
                    residual = batch_norm(
                        residual, params, state, upd, f"{name}.downsample.1", train
                    )
                if "bottleneck" in spec.block:
                    # preact bottleneck: 1x1 conv1 is stride 1; the 3x3
                    # conv2 carries the stride (lmodels/cifar_resnet.py
                    # PreActBottleneck)
                    out = _pconv(plans, params, f"{name}.conv1", out, 1, 1, 0, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn2", train)
                    out = jax.nn.relu(out)
                    out = _pconv(plans, params, f"{name}.conv2", out, s, 1, 1, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn3", train)
                    out = jax.nn.relu(out)
                    out = _pconv(plans, params, f"{name}.conv3", out, 1, 1, 0, cd)
                else:
                    out = _pconv(plans, params, f"{name}.conv1", out, s, 1, 1, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn2", train)
                    out = jax.nn.relu(out)
                    out = _pconv(plans, params, f"{name}.conv2", out, 1, 1, 1, cd)
                x = out + residual
            else:
                residual = x
                if "bottleneck" in spec.block:
                    out = _pconv(plans, params, f"{name}.conv1", x, 1, 1, 0, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn1", train)
                    out = jax.nn.relu(out)
                    out = _pconv(plans, params, f"{name}.conv2", out, s, 1, 1, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn2", train)
                    out = jax.nn.relu(out)
                    out = _pconv(plans, params, f"{name}.conv3", out, 1, 1, 0, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn3", train)
                else:
                    out = _pconv(plans, params, f"{name}.conv1", x, s, 1, 1, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn1", train)
                    out = jax.nn.relu(out)
                    out = _pconv(plans, params, f"{name}.conv2", out, 1, 1, 1, cd)
                    out = batch_norm(out, params, state, upd, f"{name}.bn2", train)
                if has_ds:
                    residual = _pconv(plans, params, f"{name}.downsample.0", x, s, 1, 0, cd)
                    residual = batch_norm(
                        residual, params, state, upd, f"{name}.downsample.1", train
                    )
                x = jax.nn.relu(out + residual)
        return x, upd

    for g in (1, 2, 3):
        x = _group(
            upd, remat,
            partial(group_fn, g=g, stride=1 if g == 1 else 2),
            params, state, x,
        )
    if preact:
        x = batch_norm(x, params, state, upd, "bn", train)
        x = jax.nn.relu(x)
    # AvgPool2d(8) then flatten — CIFAR 32x32 ends at 8x8, so == global mean
    x = _global_avgpool(x)
    return linear(x, params, "fc", cd)


# --------------------------------------------------------------------------
# family: tvresnet (torchvision-style with CIFAR stem)
# --------------------------------------------------------------------------


def _init_tvresnet(spec: CifarSpec, I: _Init):
    exp = 4 if spec.block == "bottleneck" else 1
    I.conv("conv1", 3, 64, 3)
    I.bn("bn1", 64)
    inp = 64
    for g, planes in enumerate([64, 128, 256, 512], start=1):
        stride = 1 if g == 1 else 2
        width = int(planes * (spec.width_per_group / 64.0)) * spec.groups
        for b in range(spec.layers[g - 1]):
            name = f"layer{g}.{b}"
            s = stride if b == 0 else 1
            if b == 0 and (s != 1 or inp != planes * exp):
                I.conv(f"{name}.downsample.0", inp, planes * exp, 1)
                I.bn(f"{name}.downsample.1", planes * exp)
            if spec.block == "bottleneck":
                I.conv(f"{name}.conv1", inp, width, 1)
                I.bn(f"{name}.bn1", width)
                I.conv(f"{name}.conv2", width // spec.groups, width, 3)
                I.bn(f"{name}.bn2", width)
                I.conv(f"{name}.conv3", width, planes * 4, 1)
                I.bn(f"{name}.bn3", planes * 4)
            else:
                I.conv(f"{name}.conv1", inp, planes, 3)
                I.bn(f"{name}.bn1", planes)
                I.conv(f"{name}.conv2", planes, planes, 3)
                I.bn(f"{name}.bn2", planes)
            inp = planes * exp
    I.linear("fc", 512 * exp, spec.num_classes)


def _fwd_tvresnet(params, state, x, spec, train, cd, upd, plans=None,
                  remat=False):
    x = _pconv(plans, params, "conv1", x, 1, 1, 1, cd)
    x = jax.nn.relu(batch_norm(x, params, state, upd, "bn1", train))

    def group_fn(params, state, x, g, stride):
        upd: State = {}
        for b in range(spec.layers[g - 1]):
            name = f"layer{g}.{b}"
            s = stride if b == 0 else 1
            residual = x
            if spec.block == "bottleneck":
                out = _pconv(plans, params, f"{name}.conv1", x, 1, 1, 0, cd)
                out = jax.nn.relu(batch_norm(out, params, state, upd, f"{name}.bn1", train))
                out = _pconv(
                    plans, params, f"{name}.conv2", out, s, 1, 1, cd,
                    groups=spec.groups,
                )
                out = jax.nn.relu(batch_norm(out, params, state, upd, f"{name}.bn2", train))
                out = _pconv(plans, params, f"{name}.conv3", out, 1, 1, 0, cd)
                out = batch_norm(out, params, state, upd, f"{name}.bn3", train)
            else:
                out = _pconv(plans, params, f"{name}.conv1", x, s, 1, 1, cd)
                out = jax.nn.relu(batch_norm(out, params, state, upd, f"{name}.bn1", train))
                out = _pconv(plans, params, f"{name}.conv2", out, 1, 1, 1, cd)
                out = batch_norm(out, params, state, upd, f"{name}.bn2", train)
            if f"{name}.downsample.0.weight" in params:
                residual = _pconv(plans, params, f"{name}.downsample.0", x, s, 1, 0, cd)
                residual = batch_norm(
                    residual, params, state, upd, f"{name}.downsample.1", train
                )
            x = jax.nn.relu(out + residual)
        return x, upd

    for g in (1, 2, 3, 4):
        x = _group(
            upd, remat,
            partial(group_fn, g=g, stride=1 if g == 1 else 2),
            params, state, x,
        )
    x = _global_avgpool(x)
    return linear(x, params, "fc", cd)


# --------------------------------------------------------------------------
# family: vgg / rvgg
# --------------------------------------------------------------------------


def _vgg_layout(spec: CifarSpec):
    """Sequential-index layout of the features stack (index parity with the
    torch Sequential built by make_layers)."""
    cfg = (RVGG_CFGS if spec.family == "rvgg" else VGG_CFGS)[spec.vgg_cfg]
    items = []  # (kind, seq_index, cin, cout)
    idx = 0
    cin = 3
    first = True
    for v in cfg:
        if v == "M":
            items.append(("pool", idx, 0, 0))
            idx += 1
            continue
        if spec.family == "rvgg" and not first:
            # residual-VGG wraps later convs in BasicBlock submodules
            items.append(("rblock", idx, cin, v))
            idx += 1
        else:
            items.append(("conv", idx, cin, v))
            idx += 1
            if spec.vgg_bn:
                items.append(("bn", idx, v, v))
                idx += 1
            items.append(("relu", idx, 0, 0))
            idx += 1
        cin = v
        first = False
    return items


def _init_vgg(spec: CifarSpec, I: _Init):
    for kind, idx, cin, cout in _vgg_layout(spec):
        if kind == "conv":
            I.conv(f"features.{idx}", cin, cout, 3, bias=True)
        elif kind == "bn":
            I.bn(f"features.{idx}", cout)
        elif kind == "rblock":
            I.conv(f"features.{idx}.conv1", cin, cout, 3, bias=True)
            I.bn(f"features.{idx}.bn1", cout)
    f = spec.fmaps
    if spec.family == "rvgg":
        I.linear("classifier.0", f, f)
        I.linear("classifier.3", f, f)
        I.linear("classifier.6", f, spec.num_classes)
    else:
        I.linear("classifier.0", f, f)
        I.bn("classifier.1", f)
        I.linear("classifier.3", f, spec.num_classes)


def _fwd_vgg(params, state, x, spec, train, cd, upd, plans=None,
             remat=False):
    # remat groups = the segments between maxpools (the natural "stage"
    # boundary of the VGG stack: each pool halves the live activation)
    segments: list[list] = [[]]
    for item in _vgg_layout(spec):
        segments[-1].append(item)
        if item[0] == "pool":
            segments.append([])

    def seg_fn(params, state, x, items):
        upd: State = {}
        for kind, idx, cin, cout in items:
            name = f"features.{idx}"
            if kind == "conv":
                x = _pconv(plans, params, name, x, 1, 1, 1, cd)
                x = x + params[f"{name}.bias"].astype(x.dtype)
            elif kind == "bn":
                x = batch_norm(x, params, state, upd, name, train)
            elif kind == "relu":
                x = jax.nn.relu(x)
            elif kind == "pool":
                x = _maxpool2(x)
            elif kind == "rblock":
                identity = x
                out = _pconv(plans, params, f"{name}.conv1", x, 1, 1, 1, cd)
                out = out + params[f"{name}.conv1.bias"].astype(out.dtype)
                out = batch_norm(out, params, state, upd, f"{name}.bn1", train)
                if spec.rvgg_res and cin == cout:
                    out = out + identity
                x = jax.nn.relu(out)
        return x, upd

    for items in segments:
        if items:
            x = _group(upd, remat, partial(seg_fn, items=items),
                       params, state, x)
    x = _global_avgpool(x)
    if spec.family == "rvgg":
        x = jax.nn.relu(linear(x, params, "classifier.0", cd))
        x = jax.nn.relu(linear(x, params, "classifier.3", cd))
        return linear(x, params, "classifier.6", cd)
    x = linear(x, params, "classifier.0", cd)
    x = batch_norm(x, params, state, upd, "classifier.1", train)
    x = jax.nn.relu(x)
    return linear(x, params, "classifier.3", cd)


# --------------------------------------------------------------------------
# family: wrn
# --------------------------------------------------------------------------


def _init_wrn(spec: CifarSpec, I: _Init):
    k = spec.widen
    stages = [16, 16 * k, 32 * k, 64 * k]
    I.conv("conv1", 3, 16, 3, bias=True, init="xavier")
    inp = stages[0]
    for g in range(1, 4):
        planes = stages[g]
        stride = 1 if g == 1 else 2
        for b in range(spec.layers[g - 1]):
            name = f"layer{g}.{b}"
            s = stride if b == 0 else 1
            I.bn(f"{name}.bn1", inp)
            I.conv(f"{name}.conv1", inp, planes, 3, bias=True, init="xavier")
            I.bn(f"{name}.bn2", planes)
            I.conv(f"{name}.conv2", planes, planes, 3, bias=True, init="xavier")
            if s != 1 or inp != planes:
                I.conv(f"{name}.shortcut.0", inp, planes, 1, bias=True, init="xavier")
            inp = planes
    I.bn("bn1", stages[3])
    I.linear("linear", stages[3], spec.num_classes)


def _fwd_wrn(params, state, x, spec, train, cd, upd, plans=None,
             remat=False):
    x = conv2d(x, params["conv1.weight"], 1, 1, 1, cd)
    x = x + params["conv1.bias"].astype(x.dtype)

    def group_fn(params, state, x, g, stride):
        upd: State = {}
        for b in range(spec.layers[g - 1]):
            name = f"layer{g}.{b}"
            s = stride if b == 0 else 1
            # wide_basic: conv1 on relu(bn1(x)) stride 1, conv2 stride s
            # (cifar_wrn.py:24-45; the stride sits on conv2).  Block BNs use
            # the torch default momentum (0.1); only the top-level bn1 is
            # constructed with momentum=0.9 (cifar_wrn.py:61).
            out = jax.nn.relu(batch_norm(x, params, state, upd, f"{name}.bn1", train))
            out = _pconv(plans, params, f"{name}.conv1", out, 1, 1, 1, cd)
            out = out + params[f"{name}.conv1.bias"].astype(out.dtype)
            out = jax.nn.relu(batch_norm(out, params, state, upd, f"{name}.bn2", train))
            out = _pconv(plans, params, f"{name}.conv2", out, s, 1, 1, cd)
            out = out + params[f"{name}.conv2.bias"].astype(out.dtype)
            if f"{name}.shortcut.0.weight" in params:
                sc = _pconv(plans, params, f"{name}.shortcut.0", x, s, 1, 0, cd)
                sc = sc + params[f"{name}.shortcut.0.bias"].astype(sc.dtype)
            else:
                sc = x
            x = out + sc
        return x, upd

    for g in (1, 2, 3):
        x = _group(
            upd, remat,
            partial(group_fn, g=g, stride=1 if g == 1 else 2),
            params, state, x,
        )
    x = jax.nn.relu(batch_norm(x, params, state, upd, "bn1", train, momentum=0.9))
    x = _global_avgpool(x)
    return linear(x, params, "linear", cd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

_INIT = {
    "cresnet": _init_cresnet,
    "tvresnet": _init_tvresnet,
    "vgg": _init_vgg,
    "rvgg": _init_vgg,
    "wrn": _init_wrn,
}
_FWD = {
    "cresnet": _fwd_cresnet,
    "tvresnet": _fwd_tvresnet,
    "vgg": _fwd_vgg,
    "rvgg": _fwd_vgg,
    "wrn": _fwd_wrn,
}


def init_cifar(key, spec: CifarSpec) -> tuple[Params, State]:
    rng = rng_from_key(key)
    params: Params = {}
    state: State = {}
    _INIT[spec.family](spec, _Init(rng, params, state))
    return params, state


def cifar_forward(
    params: Params,
    state: State,
    x: jax.Array,
    spec: CifarSpec,
    *,
    train: bool = False,
    compute_dtype: Any = None,
    plans: dict | None = None,
    remat: bool = False,
) -> tuple[jax.Array, State]:
    """Returns (logits, bn_updates).  x is NHWC.

    ``plans`` routes named convs through per-layer execution plans
    (int8 QuantConv / sparse kernels) — the classifier-side counterpart
    of the DRNSeg serving dispatch (rmbsnn_main.py:502-549 is the
    reference's eval path this serves).

    ``remat=True`` checkpoints each stage-group (resnet layer1/2/3[/4],
    VGG pool-to-pool segment): under autodiff only group-boundary
    activations stay live and group internals are recomputed in the
    backward pass — same exact FLOPs-for-HBM trade as the DRN backbone's
    per-stage remat.  Conv-led groups are bitwise identical to the
    non-remat step; groups that START with a BatchNorm on the group input
    (preact, wrn) differ at float-rounding level (~1e-9) because XLA
    schedules the recomputed BN backward differently
    (tests/test_remat.py covers both contracts)."""
    upd: State = {}
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    logits = _FWD[spec.family](
        params, state, x, spec, train, compute_dtype, upd, plans, remat
    )
    return logits, upd


def create_cifar_model(key, arch: str, num_classes: int):
    spec = build_cifar_spec(arch, num_classes)
    params, state = init_cifar(key, spec)
    return params, state, spec
