"""CIFAR zoo tests: forward-shape sanity for every arch, and numerical
parity with the reference lmodels implementations (which are imported from
/root/reference at test time, never vendored)."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

from tpuseg.models.cifar import (
    CIFAR_ARCHS,
    build_cifar_spec,
    cifar_forward,
    create_cifar_model,
)
from tpuseg.models.torch_import import convert_state_dict


def _load_ref(name):
    # lmodels modules use package-relative imports; import via the package.
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    return importlib.import_module(f"lmodels.{name}")


@pytest.mark.parametrize(
    "arch",
    [
        "cifar_resnet20",
        "cifar_resnet164",
        "cifar_resnet18",
        "cifar_resnet50",
        "cifar_vgg16_bn",
        "cifar_rvgg11_64_bn",
        "cifar_res_rvgg11_64_bn",
        "cifar_wrn_16_4",
    ],
)
def test_forward_shapes(arch):
    params, state, spec = create_cifar_model(0, arch, 10)
    x = jnp.zeros((2, 32, 32, 3))
    logits, upd = cifar_forward(params, state, x, spec)
    assert logits.shape == (2, 10)
    _, upd = cifar_forward(params, state, x, spec, train=True)
    assert len(upd) == 2 * sum(1 for k in state if k.endswith("running_mean"))


@pytest.mark.slow
def test_all_archs_build():
    for arch in CIFAR_ARCHS:
        if arch in ("cifar_resnet1202", "cifar_resnet1001",
                    "cifar_preact_resnet1001", "cifar_resnet152",
                    "cifar_resnext101_32x8d", "cifar_wide_resnet101_2",
                    "cifar_resnet101"):
            continue  # big ones: just spec-build
        params, state, spec = create_cifar_model(0, arch, 10)
        assert params
    for arch in CIFAR_ARCHS:
        build_cifar_spec(arch, 10)


def _parity(torch_model, arch, atol=2e-4):
    torch = pytest.importorskip("torch")
    torch_model.eval()
    params, state = convert_state_dict(torch_model.state_dict())
    spec = build_cifar_spec(arch, 10)
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    out, _ = jax.jit(
        lambda p, s, v: cifar_forward(p, s, v, spec, train=False)
    )(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=atol)


@pytest.mark.slow
@requires_reference
@pytest.mark.parametrize("arch", ["cifar_resnet20", "cifar_resnet164"])
def test_parity_cresnet(arch):
    torch = pytest.importorskip("torch")
    mod = _load_ref("cifar_resnet")
    torch.manual_seed(0)
    _parity(mod.__dict__[arch](num_classes=10), arch)


@requires_reference
@pytest.mark.parametrize("arch", ["cifar_resnet18", "cifar_resnet50",
                                  "cifar_resnext50_32x4d", "cifar_wide_resnet50_2"])
@pytest.mark.slow
def test_parity_tvresnet(arch):
    torch = pytest.importorskip("torch")
    mod = _load_ref("resnet_cifar")
    torch.manual_seed(0)
    _parity(mod.__dict__[arch](num_classes=10), arch)


@requires_reference
@pytest.mark.parametrize("arch", ["cifar_vgg11", "cifar_vgg16_bn",
                                  "cifar_rvgg11_64_bn"])
def test_parity_vgg(arch):
    torch = pytest.importorskip("torch")
    mod = _load_ref("cifar_vgg")
    torch.manual_seed(0)
    _parity(mod.__dict__[arch](num_classes=10), arch)


@requires_reference
@pytest.mark.parametrize("arch", ["cifar_res_rvgg11_64_bn"])
def test_parity_rvgg(arch):
    torch = pytest.importorskip("torch")
    mod = _load_ref("cifar_rvgg")
    torch.manual_seed(0)
    _parity(mod.__dict__[arch](num_classes=10), arch)


@requires_reference
@pytest.mark.parametrize("arch", ["cifar_wrn_16_4", "cifar_wrn_28_10"])
def test_parity_wrn(arch):
    torch = pytest.importorskip("torch")
    mod = _load_ref("cifar_wrn")
    torch.manual_seed(0)
    _parity(mod.__dict__[arch](num_classes=10), arch)
