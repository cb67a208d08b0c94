"""Gathered-conv sparse lowering (tpuseg.ops.gathered_conv): exactness vs
the masked dense conv, both execution modes, on CPU (pure XLA — no Pallas,
so no interpret-mode shim needed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuseg.ops.gathered_conv import gathered_conv_apply, plan_gathered_conv
from tpuseg.sparsity.block import BlockConfig, prune_as_block


def _masked_case(rng, k, cin, cout, sparsity, dilation):
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1
    w_oihw = np.transpose(w, (3, 2, 0, 1))
    m_oihw = prune_as_block(
        w_oihw, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
    )
    mask = np.transpose(m_oihw, (2, 3, 1, 0))
    x = rng.normal(size=(1, 16, 24, cin)).astype(np.float32)
    from tpuseg.models.drn import conv2d

    pad = dilation * (k - 1) // 2
    y_ref = np.asarray(
        conv2d(jnp.asarray(x), jnp.asarray(w * mask), 1, dilation, pad)
    )
    return w, mask, x, y_ref


@pytest.mark.parametrize("mode", ["split", "grouped", "exact"])
@pytest.mark.parametrize("sparsity,dilation", [(0.5, 1), (0.875, 2)])
def test_gathered_conv_exact(mode, sparsity, dilation):
    rng = np.random.default_rng(0)
    w, mask, x, y_ref = _masked_case(rng, 3, 256, 256, sparsity, dilation)
    plan = plan_gathered_conv(w, mask, dilation=dilation,
                              dtype=jnp.float32, mode=mode)
    y = np.asarray(gathered_conv_apply(jnp.asarray(x), plan))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
    assert plan.block_density < 0.8  # actually sparse


def test_gathered_conv_1x1():
    rng = np.random.default_rng(1)
    w, mask, x, y_ref = _masked_case(rng, 1, 256, 384, 0.75, 1)
    plan = plan_gathered_conv(w, mask, dtype=jnp.float32)
    y = np.asarray(gathered_conv_apply(jnp.asarray(x), plan))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_gathered_conv_ragged_support_padding():
    """Out-blocks with fewer live K-blocks than the max are repeat-padded
    with ZERO weights — the duplicate gathered channels must not double-
    count."""
    rng = np.random.default_rng(2)
    k, cin, cout = 3, 256, 256
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1
    mask = np.zeros_like(w)
    mask[:, :, :128, :128] = 1.0          # block j=0: support {0}
    mask[:, :, :, 128:] = 1.0             # block j=1: support {0,1} (S=2)
    from tpuseg.models.drn import conv2d

    x = rng.normal(size=(1, 8, 8, cin)).astype(np.float32)
    y_ref = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w * mask), 1, 1, 1))
    plan = plan_gathered_conv(w, mask, dtype=jnp.float32)
    assert plan.s == 2
    y = np.asarray(gathered_conv_apply(jnp.asarray(x), plan))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_gathered_exact_mode_dead_out_blocks():
    """exact mode: per-block S_j with no repeat padding; out-blocks whose
    entire support is masked produce exact zeros with no conv at all."""
    rng = np.random.default_rng(4)
    k, cin, cout = 3, 256, 384
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1
    mask = np.zeros_like(w)
    mask[:, :, :128, :128] = 1.0       # block j=0: support {0} (S_0=1)
    mask[:, :, :, 128:256] = 1.0       # block j=1: support {0,1} (S_1=2)
    # block j=2: empty support (S_2=0) -> zeros, no conv
    from tpuseg.models.drn import conv2d

    x = rng.normal(size=(1, 8, 8, cin)).astype(np.float32)
    y_ref = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w * mask), 1, 1, 1))
    plan = plan_gathered_conv(w, mask, dtype=jnp.float32, mode="exact")
    assert [len(ix) for ix in plan.idx] == [1, 2, 0]
    assert plan.w[2] is None
    y = np.asarray(gathered_conv_apply(jnp.asarray(x), plan))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
    assert np.all(y[..., 256:] == 0.0)


def test_gathered_exact_int8_close_to_float():
    """quantize_gathered_plan on an exact-mode plan: per-block int8 weights
    (None for dead blocks), output within PTQ noise of masked dense."""
    from tpuseg.models.sparse_exec import quantize_sparse_plans
    from tpuseg.ops.gathered_conv import GatheredGroupConvQ

    rng = np.random.default_rng(5)
    w, mask, x, y_ref = _masked_case(rng, 3, 256, 256, 0.75, 2)
    plan = plan_gathered_conv(w, mask, dilation=2, dtype=jnp.float32,
                              mode="exact")
    qplans = quantize_sparse_plans({"c": plan})
    qp = qplans["c"]
    assert isinstance(qp, GatheredGroupConvQ)
    assert isinstance(qp.idx, list)
    yq = np.asarray(qp.apply(jnp.asarray(x)))
    assert yq.shape == y_ref.shape
    denom = np.abs(y_ref).max()
    assert np.abs(yq - y_ref).max() / denom < 0.05


@pytest.mark.slow
def test_gathered_model_forward_matches_masked_dense():
    """build_sparse_plans(lowering='gathered'): full DRN forward through
    GatheredGroupConv plans matches the masked dense forward (pure XLA,
    runs on CPU with no interpret shim)."""
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.models.drn import drn_forward
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.gathered_conv import GatheredGroupConv
    from tpuseg.sparsity import apply_masks
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    layers = [
        "layer.6.0.conv1.weight",
        "layer.6.0.conv2.weight",
        "layer.7.0.weight",
        "layer.8.0.weight",
    ]
    masks = {}
    for name in layers:
        w = hwio_to_oihw(np.asarray(folded[name]))
        m = prune_as_block(
            w, BlockConfig(0.75, 128, 128, -1, -1, collapse_tensor=False)
        )
        masks[name] = oihw_to_hwio(m).astype(np.float32)
    masked = apply_masks(folded, masks)
    plans, report = build_sparse_plans(
        masked, masks, spec, dtype=jnp.float32, lowering="gathered"
    )
    assert set(plans) == {n[: -len(".weight")] for n in layers}, report
    assert all(isinstance(p, GatheredGroupConv) for p in plans.values())

    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3), dtype=np.float32)
    )
    ref, _, _ = drn_forward(masked, {}, x, spec, train=False)
    out, _, _ = drn_forward(masked, {}, x, spec, train=False,
                            sparse_plans=plans)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_gathered_int8_close_to_float():
    """quantize_sparse_plans routes GatheredGroupConv to the int8 variant;
    outputs stay within PTQ noise of the float gathered conv."""
    from tpuseg.models.sparse_exec import quantize_sparse_plans
    from tpuseg.ops.gathered_conv import GatheredGroupConvQ

    rng = np.random.default_rng(3)
    w, mask, x, y_ref = _masked_case(rng, 3, 256, 256, 0.75, 2)
    plan = plan_gathered_conv(w, mask, dilation=2, dtype=jnp.float32)
    qplans = quantize_sparse_plans({"c": plan})
    assert isinstance(qplans["c"], GatheredGroupConvQ)
    yq = np.asarray(qplans["c"].apply(jnp.asarray(x)))
    assert yq.shape == y_ref.shape
    denom = np.abs(y_ref).max()
    assert np.abs(yq - y_ref).max() / denom < 0.05
    # static activation scale path
    qs = quantize_sparse_plans({"c": plan}, x_scales={"c": float(
        np.abs(x).max() / 127.0)})
    ys = np.asarray(qs["c"].apply(jnp.asarray(x)))
    assert np.abs(ys - y_ref).max() / denom < 0.05
