"""End-to-end sparse model execution: plans built from masks, forward
matches the masked dense forward (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tpuseg.ops.sparse_conv as sc
from tpuseg.models import init_drnseg
from tpuseg.models.drn import drn_forward
from tpuseg.models.sparse_exec import build_sparse_plans
from tpuseg.ops.fold_bn import fold_bn
from tpuseg.sparsity import apply_masks
from tpuseg.sparsity.block import BlockConfig, prune_as_block


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        sc.pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )


def _coarse_masks(params, layers, sparsity):
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio

    masks = {}
    for name in layers:
        w = hwio_to_oihw(np.asarray(params[name]))
        m = prune_as_block(
            w, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
        )
        masks[name] = oihw_to_hwio(m).astype(np.float32)
    return masks


@pytest.mark.slow
def test_sparse_model_forward_matches_masked_dense():
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    layers = [
        "layer.6.0.conv1.weight",
        "layer.6.0.conv2.weight",
        "layer.7.0.weight",
        "layer.8.0.weight",
    ]
    masks = _coarse_masks(folded, layers, 0.75)
    masked = apply_masks(folded, masks)
    plans, report = build_sparse_plans(masked, masks, spec, dtype=jnp.float32)
    assert set(plans) == {l[: -len(".weight")] for l in layers}, report

    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3), dtype=np.float32)
    )
    ref, _, _ = drn_forward(masked, {}, x, spec, train=False)
    out, _, _ = drn_forward(masked, {}, x, spec, train=False, sparse_plans=plans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_plan_report_excludes_ineligible():
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    # layer.4.0.conv1 has stride 2 -> must stay dense; layer.1.0 is 16ch
    masks = _coarse_masks(folded, ["layer.6.1.conv1.weight"], 0.875)
    masks["layer.4.0.conv1.weight"] = np.zeros_like(folded["layer.4.0.conv1.weight"])
    masks["layer.1.0.weight"] = np.zeros_like(folded["layer.1.0.weight"])
    plans, report = build_sparse_plans(folded, masks, spec, dtype=jnp.float32)
    assert "layer.6.1.conv1" in plans
    assert report["layer.4.0.conv1"].startswith("dense: stride")
    assert report["layer.1.0"].startswith("dense: channels")


def test_compact_sparse_composition():
    """A mask with dead input channels AND block sparsity in the survivor
    lowers to CompactSparse (channel slice + fused kernel) and matches the
    masked dense forward."""
    from tpuseg.models.sparse_exec import CompactSparse

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    name = "layer.6.1.conv1.weight"  # 3x3 512->512 d=4 stride 1
    masks = _coarse_masks(folded, [name], 0.875)
    m = np.asarray(masks[name])
    assert (np.abs(m).sum(axis=(0, 1, 3)) == 0).any(), "need dead channels"
    masked = apply_masks(folded, masks)
    plans, report = build_sparse_plans(masked, masks, spec, dtype=jnp.float32)
    cname = name[: -len(".weight")]
    assert isinstance(plans[cname], CompactSparse), report[cname]

    x = jnp.asarray(
        np.random.default_rng(1).random((1, 64, 64, 3), dtype=np.float32)
    )
    ref, _, _ = drn_forward(masked, {}, x, spec, train=False)
    out, _, _ = drn_forward(
        masked, {}, x, spec, train=False, sparse_plans=plans
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_quantized_sparse_plans_forward():
    """prune + int8 composition: quantized sparse plans route through the
    model forward and approximate the masked dense forward."""
    from tpuseg.models.sparse_exec import quantize_sparse_plans

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    layers = ["layer.6.0.conv1.weight", "layer.8.0.weight"]
    masks = _coarse_masks(folded, layers, 0.75)
    masked = apply_masks(folded, masks)
    plans, _ = build_sparse_plans(masked, masks, spec, dtype=jnp.float32)
    qplans = quantize_sparse_plans(plans)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3), dtype=np.float32)
    )
    ref, _, _ = drn_forward(masked, {}, x, spec, train=False)
    out, _, _ = drn_forward(masked, {}, x, spec, train=False,
                            sparse_plans=qplans)
    # log-softmax outputs; int8 conv noise shifts logits slightly
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.5, err
    ids_ref = np.asarray(jnp.argmax(ref, -1))
    ids_q = np.asarray(jnp.argmax(out, -1))
    assert (ids_ref == ids_q).mean() > 0.95
