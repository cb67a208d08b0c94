"""Model construction + forward-shape tests, and numerical parity with the
reference PyTorch implementation (loaded from /root/reference at test time —
never vendored)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.models import (
    build_drn_spec,
    drn_forward,
    drnseg_forward,
    init_drn,
    init_drnseg,
)
from tpuseg.models.drnseg import bilinear_upsample_kernel, upsample8
from tpuseg.models.torch_import import convert_state_dict

from conftest import requires_reference


def test_drn_d_22_spec_names():
    spec = build_drn_spec("drn_d_22", naming="seg")
    params, state = init_drn(jax.random.key(0), spec)
    # Keys the shipped pruning configs target must exist
    # (optimal_configs/drn_d_22/*.json).
    for k in [
        "layer.1.0.weight",
        "layer.2.0.weight",
        "layer.3.0.conv1.weight",
        "layer.3.0.downsample.0.weight",
        "layer.4.1.conv2.weight",
        "layer.5.0.downsample.0.weight",
        "layer.6.1.conv2.weight",
        "layer.7.0.weight",
        "layer.8.0.weight",
    ]:
        assert k in params, k
    assert "layer.1.1.running_mean" in state
    assert spec.out_dim == 512


@pytest.mark.slow
def test_drn_d_54_spec_names():
    spec = build_drn_spec("drn_d_54", naming="seg")
    params, _ = init_drn(jax.random.key(0), spec)
    assert "layer.3.0.conv3.weight" in params
    assert params["layer.3.0.conv3.weight"].shape == (1, 1, 64, 256)
    # layers 7/8 of arch D are plain 512-channel conv stages (drn.py:159-163),
    # so out_dim is channels[-1] = 512 even for bottleneck variants.
    assert spec.out_dim == 512


def test_drnseg_forward_shapes():
    params, state, spec = init_drnseg(jax.random.key(0), "drn_d_22", 19)
    x = jnp.zeros((1, 64, 64, 3))
    logp, seg, updates = drnseg_forward(params, state, x, spec)
    assert logp.shape == (1, 64, 64, 19)
    assert seg.shape == (1, 8, 8, 19)
    assert not updates
    # train mode produces BN updates
    _, _, updates = drnseg_forward(params, state, x, spec, train=True)
    assert len(updates) == 2 * sum(1 for k in state if k.endswith("running_mean"))
    # log-softmax normalization
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4
    )


def test_bilinear_kernel_values():
    w = bilinear_upsample_kernel(16)
    assert w.shape == (16, 16)
    # symmetric and peak near center
    np.testing.assert_allclose(w, w.T, rtol=1e-6)
    np.testing.assert_allclose(w, w[::-1, ::-1], rtol=1e-6)
    assert w.max() == pytest.approx((1 - abs(7 / 8 - 15 / 16)) ** 2)


def test_upsample8_matches_interpolation_structure():
    # Upsampling a constant field must reproduce the constant away from borders.
    x = jnp.ones((1, 8, 8, 3))
    k = jnp.asarray(bilinear_upsample_kernel())
    y = upsample8(x, k)
    assert y.shape == (1, 64, 64, 3)
    interior = np.asarray(y)[0, 16:48, 16:48, :]
    np.testing.assert_allclose(interior, 1.0, rtol=1e-5)


@pytest.mark.slow
@requires_reference
@pytest.mark.parametrize("arch", ["drn_d_22", "drn_d_54"])
def test_parity_with_torch_backbone(arch):
    """Random-weight forward parity: torch reference DRN vs tpuseg DRN."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys

    spec_ = importlib.util.spec_from_file_location(
        "ref_drn", "/root/reference/drn.py"
    )
    ref_drn = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(ref_drn)

    torch.manual_seed(0)
    model = ref_drn.__dict__[arch](pretrained=False, num_classes=1000, pool_size=7)
    model.eval()

    params, state = convert_state_dict(model.state_dict())
    spec = build_drn_spec(arch, num_classes=1000, naming="cls", pool_size=7)

    x = np.random.default_rng(1).normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x)).numpy()

    out, _, _ = jax.jit(
        lambda p, s, v: drn_forward(p, s, v, spec, train=False)
    )(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


@requires_reference
def test_parity_with_torch_drnseg():
    """Parity of the full DRNSeg head (seg conv + transposed-conv upsample +
    log-softmax) against the reference implementation."""
    torch = pytest.importorskip("torch")
    import importlib.util

    spec_ = importlib.util.spec_from_file_location("ref_drn2", "/root/reference/drn.py")
    ref_drn = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(ref_drn)

    import math

    import torch.nn as nn

    torch.manual_seed(0)
    backbone = ref_drn.drn_d_22(pretrained=False, num_classes=1000)
    classes = 19

    # Assemble the reference DRNSeg inline (semantic_seg.py:126-158) without
    # copying: Sequential of children[:-2], 1x1 seg conv, frozen up conv.
    layer = nn.Sequential(*list(backbone.children())[:-2])
    seg = nn.Conv2d(512, classes, kernel_size=1, bias=True)
    up = nn.ConvTranspose2d(
        classes, classes, 16, stride=8, padding=4, output_padding=0,
        groups=classes, bias=False,
    )
    f = math.ceil(16 / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = up.weight.data
    for i in range(16):
        for j in range(16):
            w[0, 0, i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    for ch in range(1, classes):
        w[ch, 0] = w[0, 0]

    class RefSeg(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer, self.seg, self.up = layer, seg, up

        def forward(self, x):
            x = self.layer(x)
            x = self.seg(x)
            y = self.up(x)
            return nn.functional.log_softmax(y, dim=1), x

    ref = RefSeg().eval()
    params, state = convert_state_dict(ref.state_dict())
    spec = build_drn_spec("drn_d_22", num_classes=0, naming="seg")

    x = np.random.default_rng(2).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_logp, ref_seg = ref(torch.from_numpy(x))

    logp, seg_out, _ = jax.jit(
        lambda p, s, v: drnseg_forward(p, s, v, spec, train=False)
    )(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(seg_out), (0, 3, 1, 2)),
        ref_seg.numpy(),
        rtol=2e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(logp), (0, 3, 1, 2)),
        ref_logp.numpy(),
        rtol=2e-4,
        atol=2e-4,
    )


def test_export_state_dict_roundtrip():
    """convert_state_dict(export_state_dict(p, s)) is identity (interop)."""
    from tpuseg.models.torch_import import convert_state_dict, export_state_dict

    params, state, _ = init_drnseg(0, "drn_d_22", 19)
    sd = export_state_dict(params, state)
    assert sd["layer.3.0.conv1.weight"].shape == (64, 32, 3, 3)  # OIHW
    p2, s2 = convert_state_dict(sd)
    for k in ("layer.3.0.conv1.weight", "seg.bias"):
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(params[k]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2["layer.1.1.running_var"]),
        np.asarray(state["layer.1.1.running_var"]),
        rtol=1e-6,
    )


def _fake_classifier_pth(tmp_path, seed=5):
    """A DRN-D-22 ImageNet-classifier checkpoint in torch layout (backbone
    + fc head + num_batches_tracked), standing in for the published
    drn_d_22-4bd2f8ea.pth (drn.py:20)."""
    import torch

    from tpuseg.models.torch_import import export_state_dict

    import re

    params, state, _ = init_drnseg(seed, "drn_d_22", 19)
    bb = {k: v for k, v in params.items()
          if not k.startswith(("seg.", "up."))}
    # REAL published classifier checkpoints use torch attribute naming
    # (``layer3.0.conv1.weight`` — no dot after "layer"); fabricate the
    # same so the test exercises the cls->seg key remap the bootstrap
    # performs (round-4 review: a seg-keyed fake masked its absence)
    cls_key = lambda k: re.sub(r"^layer\.(\d+)\.", r"layer\1.", k)
    sd = {cls_key(k): torch.from_numpy(np.asarray(v).copy())
          for k, v in export_state_dict(bb, state).items()}
    sd["fc.weight"] = torch.zeros(1000, 512, 1, 1)
    sd["fc.bias"] = torch.zeros(1000)
    sd["layer1.1.num_batches_tracked"] = torch.tensor(7)
    path = str(tmp_path / "drn_d_22-4bd2f8ea.pth")
    torch.save(sd, path)
    return path, params, state


def test_pretrained_backbone_transplant(tmp_path):
    """--pretrained-backbone contract (reference pretrained=True,
    drn.py:15-24): the classifier checkpoint fills the backbone, the
    fc head is dropped, and the seg/up head keeps its fresh init."""
    from tpuseg.models.torch_import import load_pretrained_backbone

    path, src_params, src_state = _fake_classifier_pth(tmp_path)
    params, state, _ = init_drnseg(0, "drn_d_22", 19)
    out_p, out_s, n = load_pretrained_backbone(
        "drn_d_22", path, params, state)
    assert n > 40
    np.testing.assert_array_equal(
        np.asarray(out_p["layer.3.0.conv1.weight"]),
        np.asarray(src_params["layer.3.0.conv1.weight"]))
    np.testing.assert_array_equal(
        np.asarray(out_s["layer.1.1.running_var"]),
        np.asarray(src_state["layer.1.1.running_var"]))
    # head untouched; fc not transplanted
    np.testing.assert_array_equal(
        np.asarray(out_p["seg.weight"]), np.asarray(params["seg.weight"]))
    assert "fc.weight" not in out_p


def test_pretrained_backbone_url_uses_cache(tmp_path):
    """A URL source resolves through the cache directory without touching
    the network when the file is pre-placed (model_zoo-cache contract)."""
    from tpuseg.models.torch_import import (
        DRN_MODEL_URLS,
        load_pretrained_backbone,
        resolve_backbone_source,
    )

    path, src_params, _ = _fake_classifier_pth(tmp_path)
    url = resolve_backbone_source("auto", "drn_d_22")
    assert url == DRN_MODEL_URLS["drn_d_22"]
    assert os.path.basename(path) == os.path.basename(url)  # cache key
    params, state, _ = init_drnseg(0, "drn_d_22", 19)
    out_p, _, n = load_pretrained_backbone(
        "drn_d_22", "auto", params, state, cache_dir=str(tmp_path))
    assert n > 40
    np.testing.assert_array_equal(
        np.asarray(out_p["layer.6.0.conv2.weight"]),
        np.asarray(src_params["layer.6.0.conv2.weight"]))


def test_pretrained_backbone_wrong_arch_raises(tmp_path):
    from tpuseg.models.torch_import import load_pretrained_backbone

    path, _, _ = _fake_classifier_pth(tmp_path)
    params, state, _ = init_drnseg(0, "drn_d_54", 19)
    with pytest.raises((KeyError, ValueError)):
        load_pretrained_backbone("drn_d_54", path, params, state)


@requires_reference
@pytest.mark.parametrize("arch", ["drn_c_26"])
def test_parity_with_torch_drn_c(arch):
    """C-variant: top-level conv1/bn1 stem, BasicBlock layers 1-2, and
    residual=False layers 7-8 (drn.py:121-130,152-158)."""
    torch = pytest.importorskip("torch")
    import importlib.util

    spec_ = importlib.util.spec_from_file_location("ref_drnc", "/root/reference/drn.py")
    ref_drn = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(ref_drn)

    torch.manual_seed(1)
    model = ref_drn.__dict__[arch](pretrained=False, num_classes=10, pool_size=7)
    model.eval()
    params, state = convert_state_dict(model.state_dict())
    spec = build_drn_spec(arch, num_classes=10, naming="cls", pool_size=7)

    x = np.random.default_rng(5).normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x)).numpy()
    out, _, _ = jax.jit(
        lambda p, s, v: drn_forward(p, s, v, spec, train=False)
    )(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


@requires_reference
@pytest.mark.slow
def test_parity_with_torch_drn_a_50():
    """Random-weight forward parity of DRN_A (maxpool stem, dilated layer3/4,
    Linear head — /root/reference/drn.py:262-330, drn_a_50 at :333-337)."""
    torch = pytest.importorskip("torch")
    import importlib.util

    spec_ = importlib.util.spec_from_file_location(
        "ref_drn_a", "/root/reference/drn.py"
    )
    ref_drn = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(ref_drn)

    torch.manual_seed(0)
    model = ref_drn.drn_a_50(pretrained=False, num_classes=1000)
    # the reference hardcodes AvgPool2d(28) for 224x224 inputs; shrink both
    # sides identically so the test runs on 112x112
    model.avgpool = torch.nn.AvgPool2d(14, stride=1)
    model.eval()

    params, state = convert_state_dict(model.state_dict())
    spec = build_drn_spec("drn_a_50", num_classes=1000, naming="cls", pool_size=14)

    x = np.random.default_rng(1).normal(size=(1, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x)).numpy()

    out, _, _ = jax.jit(
        lambda p, s, v: drn_forward(p, s, v, spec, train=False)
    )(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)
