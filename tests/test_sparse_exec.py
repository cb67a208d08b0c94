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


def test_gathered_1x1_eligibility_rule():
    """1x1 convs lower via gathered only when the gather is nearly free
    (block density <= GATHER_1X1_MAX_DENSITY) or exact mode can skip dead
    out-blocks — measured on-chip rule (PERF_NOTES round 5 "1x1 gathered
    eligibility": all-1x1 serving is 0.92x dense on DRN-D-54; the rule
    lifts block128reg serving 1.17x -> 1.52x, raw block128 unchanged)."""
    import os

    from conftest import VENDORED_CONFIGS
    from tpuseg.ops.gathered_conv import GatheredGroupConv
    from tpuseg.sparsity import create_masker

    params, state, spec = init_drnseg(0, "drn_d_54", 19)

    def plans_for(cfg_name):
        cfg = os.path.join(VENDORED_CONFIGS, "drn_d_54", cfg_name)
        masker = create_masker(cfg, seed=0)
        masks = masker.generate_masks(params, is_static=True, verbose=False)
        masked = dict(apply_masks(params, masks))
        folded = fold_bn(masked, state, spec)
        return build_sparse_plans(folded, masks, spec, lowering="gathered",
                                  gathered_mode="exact"), masked

    (plans, report), masked = plans_for("drn_d_54_block128reg_87.50.json")

    def k(name):
        return int(np.asarray(masked[name + ".weight"]).shape[0])

    ones = {n: p for n, p in plans.items()
            if isinstance(p, GatheredGroupConv) and k(n) == 1}
    # reg N:M geometry: no dead out-blocks, so only density<=0.13 1x1s stay
    assert ones, "expected some low-density 1x1 plans to survive"
    for n, p in ones.items():
        assert p.block_density <= 0.13, (n, p.block_density)
    # the mid/high-density 1x1s are reported dense with the rule's reason
    excluded = [n for n, r in report.items()
                if "1x1 gather unpaid" in str(r)]
    assert len(excluded) >= 10, (len(excluded), report)
    # raw BlockPruner geometry: dead out-blocks keep every 1x1 lowered
    (plans_raw, report_raw), masked_raw = plans_for(
        "drn_d_54_block128_87.50.json")
    assert not any("1x1 gather unpaid" in str(r)
                   for r in report_raw.values()), report_raw
