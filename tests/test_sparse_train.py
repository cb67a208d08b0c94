"""Sparse training: forward and gradient parity vs the dense-masked conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tpuseg.ops.sparse_conv as sc
from tpuseg.models.drn import conv2d
from tpuseg.ops.sparse_train import (
    pack_vals,
    plan_sparse_conv_train,
    sparse_conv_train,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        sc.pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )


def _mask(rng, kernel, cin, cout, density=0.25):
    nz = (rng.random((cin // 128, cout // 128)) < density)
    nz[0, 0] = True
    m2 = np.kron(nz, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(m2, (kernel, kernel, cin, cout)).copy()
    if kernel > 1:
        # vary support per tap: drop some blocks at random taps so the
        # per-tap structural zeroing (nzsel) is exercised
        drop = rng.random((kernel, kernel, cin // 128, cout // 128)) < 0.3
        mask *= np.kron(1.0 - drop, np.ones((128, 128))).astype(np.float32)
    return mask.astype(np.float32)


@pytest.mark.parametrize("kernel,dilation", [(3, 2), (1, 1)])
def test_sparse_train_grads_match_dense_masked(kernel, dilation):
    rng = np.random.default_rng(0)
    cin = cout = 256
    w = rng.normal(size=(kernel, kernel, cin, cout)).astype(np.float32)
    mask = _mask(rng, kernel, cin, cout, density=0.5)
    st = plan_sparse_conv_train(mask, dilation=dilation, rows_per_tile=4)
    assert st.block_density <= 0.75

    x = rng.normal(size=(2, 8, 16, cin)).astype(np.float32)
    dy_seed = rng.normal(size=(2, 8, 16, cout)).astype(np.float32)
    pad = dilation * (kernel - 1) // 2
    mj = jnp.asarray(mask)

    def loss_dense(w_, x_):
        y = conv2d(x_, w_ * mj, stride=1, dilation=dilation, padding=pad)
        return jnp.sum(y * dy_seed)

    def loss_sparse(w_, x_):
        y = sparse_conv_train(x_, w_, st, compute_dtype=jnp.float32)
        return jnp.sum(y * dy_seed)

    wj, xj = jnp.asarray(w), jnp.asarray(x)
    yd = conv2d(xj, wj * mj, stride=1, dilation=dilation, padding=pad)
    ys = sparse_conv_train(xj, wj, st, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yd),
                               rtol=1e-3, atol=1e-3)

    gd_w, gd_x = jax.grad(loss_dense, argnums=(0, 1))(wj, xj)
    gs_w, gs_x = jax.grad(loss_sparse, argnums=(0, 1))(wj, xj)
    # dense-masked wgrad is nonzero only on the mask support; sparse wgrad
    # is zero off-support by construction
    np.testing.assert_allclose(np.asarray(gs_x), np.asarray(gd_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs_w), np.asarray(gd_w * mj),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_seg_train_step_sparse_exec_matches_masked_dense():
    """FULL train-step parity: make_seg_train_step(sparse_plans=...) vs the
    reference-semantics masked-dense step.  The sparse step changes only
    gradients the per-step mask projection re-zeroes anyway, so losses,
    params (all of them — masked positions are zero in both), and BN state
    must track up to float associativity."""
    from tpuseg.models import init_drnseg
    from tpuseg.ops.sparse_train import build_sparse_train_structs
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block
    from tpuseg.train import create_train_state, make_seg_train_step, make_sgd

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    layers = ["layer.6.0.conv1.weight", "layer.7.0.weight"]
    masks = {}
    for name in layers:
        w = hwio_to_oihw(np.asarray(params[name]))
        m = prune_as_block(
            w, BlockConfig(0.75, 128, 128, -1, -1, collapse_tensor=False)
        )
        masks[name] = oihw_to_hwio(m).astype(np.float32)

    structs, report = build_sparse_train_structs(masks, spec)
    assert set(structs) == {l[: -len(".weight")] for l in layers}, report

    # lr must keep training STABLE: at a diverging lr (0.05 here doubles the
    # loss per step) BatchNorm chaotically amplifies reassociation noise and
    # the two float-identical-in-exact-arithmetic trajectories drift to 1e-3
    # in 2 steps (measured); at 0.005 the drift stays ~1e-4.
    tx = make_sgd(lambda _: 0.005, 0.9, 1e-4)
    data_rng = np.random.default_rng(7)
    batches = [
        (
            data_rng.random((2, 64, 64, 3), dtype=np.float32),
            data_rng.integers(0, 19, size=(2, 64, 64)).astype(np.int32),
        )
        for _ in range(2)
    ]

    def run(plans):
        ts = create_train_state(params, state, tx, masks)
        step = jax.jit(
            make_seg_train_step(spec, tx, compute_dtype=None,
                                sparse_plans=plans)
        )
        losses = []
        for im, lb in batches:
            ts, m = step(ts, jnp.asarray(im), jnp.asarray(lb))
            losses.append(float(m["loss"]))
        return ts, losses

    ts_d, loss_d = run(None)
    ts_s, loss_s = run(structs)
    np.testing.assert_allclose(loss_s, loss_d, rtol=1e-3)
    for k in ts_d.params:
        np.testing.assert_allclose(
            np.asarray(ts_s.params[k]), np.asarray(ts_d.params[k]),
            rtol=2e-3, atol=5e-4, err_msg=k,
        )
    for k in ts_d.bn_state:
        np.testing.assert_allclose(
            np.asarray(ts_s.bn_state[k]), np.asarray(ts_d.bn_state[k]),
            rtol=2e-3, atol=5e-4, err_msg=k,
        )
    # masked positions stay exactly zero through the sparse step too
    for name in layers:
        off = np.asarray(ts_s.params[name]) * (1 - masks[name])
        assert float(np.abs(off).max()) == 0.0


def test_pack_vals_roundtrip_gradient():
    """Packing VJP scatters exactly onto the support."""
    rng = np.random.default_rng(1)
    mask = _mask(rng, 1, 128, 256, density=0.99)  # one block row
    mask[..., :, 128:] = 0.0
    st = plan_sparse_conv_train(mask)
    w = jnp.asarray(rng.normal(size=(1, 1, 128, 256)).astype(np.float32))

    def f(w_):
        return jnp.sum(pack_vals(w_, st, dtype=jnp.float32) ** 2)

    g = jax.grad(f)(w)
    # off-support weight gradient must be exactly zero
    assert float(jnp.abs(g * (1 - jnp.asarray(mask))).max()) == 0.0
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * w * mask),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sparse_exec_composes_with_remat():
    """--sparse-exec + --remat: the rematerialized backward replays the
    pack + fused kernel inside jax.checkpoint; one train step must match
    the non-remat sparse step (CPU path is exact replay — bitwise-level
    tolerance)."""
    from tpuseg.models import init_drnseg
    from tpuseg.ops.sparse_train import build_sparse_train_structs
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block
    from tpuseg.train import create_train_state, make_seg_train_step, make_sgd

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    layers = ["layer.6.0.conv1.weight", "layer.7.0.weight"]
    masks = {}
    for name in layers:
        w = hwio_to_oihw(np.asarray(params[name]))
        m = prune_as_block(
            w, BlockConfig(0.75, 128, 128, -1, -1, collapse_tensor=False))
        masks[name] = oihw_to_hwio(m).astype(np.float32)
    structs, _ = build_sparse_train_structs(masks, spec)
    tx = make_sgd(lambda _: 0.005, 0.9, 1e-4)
    rng = np.random.default_rng(9)
    im = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    lb = jnp.asarray(rng.integers(0, 19, size=(2, 64, 64)).astype(np.int32))

    outs = {}
    for name, remat in (("plain", False), ("remat", True)):
        ts = create_train_state(params, state, tx, masks)
        step = jax.jit(make_seg_train_step(
            spec, tx, compute_dtype=None, sparse_plans=structs, remat=remat))
        ts, m = step(ts, im, lb)
        outs[name] = (float(m["loss"]), ts)
    np.testing.assert_allclose(outs["remat"][0], outs["plain"][0], rtol=1e-6)
    for k in outs["plain"][1].params:
        np.testing.assert_allclose(
            np.asarray(outs["remat"][1].params[k]),
            np.asarray(outs["plain"][1].params[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)
