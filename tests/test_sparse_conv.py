"""Sparse conv lowering: correctness vs masked dense conv (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tpuseg.ops.sparse_conv as sc
from tpuseg.models.drn import conv2d
from tpuseg.ops.sparse_conv import (
    bsr_matmul_xw,
    pack_xw_bsr,
    plan_sparse_conv,
    sparse_conv_apply,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        sc.pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )


def _coarse_mask(rng, K, M, density, bk=128, bm=128):
    nz = (rng.random((K // bk, M // bm)) < density).astype(np.float32)
    nz[0, :] = 1  # every column block keeps at least one
    return np.kron(nz, np.ones((bk, bm), np.float32))


def test_xw_bsr_matmul():
    rng = np.random.default_rng(0)
    K, M, P = 256, 384, 256
    w = rng.normal(size=(K, M)).astype(np.float32)
    mask = _coarse_mask(rng, K, M, 0.4)
    packed = pack_xw_bsr(w * mask, dtype=jnp.float32)
    x = rng.normal(size=(P, K)).astype(np.float32)
    y = bsr_matmul_xw(jnp.asarray(x), packed, bp=128)
    np.testing.assert_allclose(np.asarray(y), x @ (w * mask), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel,dilation", [(1, 1), (3, 1), (3, 2)])
def test_sparse_conv_matches_masked_dense(kernel, dilation):
    rng = np.random.default_rng(1)
    cin = cout = 256
    w = rng.normal(size=(kernel, kernel, cin, cout)).astype(np.float32)
    coarse = np.array([[1, 0], [1, 1]], dtype=np.float32)  # 75% block density
    mask2d = np.kron(coarse, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (kernel, kernel, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(1, 8, 16, cin)).astype(np.float32))

    plan = plan_sparse_conv(w, mask, dtype=jnp.float32)
    assert plan.density < 0.9
    y = sparse_conv_apply(x, plan, dilation=dilation, bp=128)

    pad = dilation * (kernel - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_plan_keeps_fine_masks_dense():
    """RBGP-style fine blocklets coarsen to fully dense -> dense path."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(1, 1, 128, 128)).astype(np.float32)
    fine = (rng.random((128, 128)) < 0.5).astype(np.float32)  # 1x1 blocklets
    plan = plan_sparse_conv(w, fine[None, None], dtype=jnp.float32)
    assert plan.density == 1.0
    assert not isinstance(plan.taps[0][2], sc.XwBsr)


@pytest.mark.parametrize("kernel,dilation", [(3, 1), (3, 2), (1, 1)])
def test_fused_sparse_conv_matches_masked_dense(kernel, dilation):
    from tpuseg.ops.sparse_conv import fused_sparse_conv_apply, plan_fused_sparse_conv

    rng = np.random.default_rng(4)
    cin = cout = 256
    w = rng.normal(size=(kernel, kernel, cin, cout)).astype(np.float32)
    coarse = np.array([[1, 0], [1, 1]], dtype=np.float32)
    mask2d = np.kron(coarse, np.ones((128, 128), np.float32))
    # vary the mask per tap to exercise per-tap supports
    mask = np.stack([
        np.stack([np.roll(mask2d, t, axis=0 if kernel > 1 else 1)
                  for t in range(kernel)], 0)
        for _ in range(kernel)
    ], 0).reshape(kernel, kernel, cin, cout)

    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_fused_sparse_conv(w, mask, dilation=dilation, dtype=jnp.float32)
    y = fused_sparse_conv_apply(x, plan, rows_per_tile=4)

    pad = dilation * (kernel - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kernel,dilation", [(3, 2), (1, 1)])
def test_shared_fused_sparse_conv_matches(kernel, dilation):
    from tpuseg.ops.sparse_conv import plan_shared_sparse_conv, shared_sparse_conv_apply

    rng = np.random.default_rng(6)
    cin = cout = 256
    w = rng.normal(size=(kernel, kernel, cin, cout)).astype(np.float32)
    coarse = np.array([[1, 0], [1, 1]], dtype=np.float32)
    mask2d = np.kron(coarse, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (kernel, kernel, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_shared_sparse_conv(w, mask, dilation=dilation, dtype=jnp.float32)
    assert plan.union_density == 1.0  # both K-blocks used by some column
    y = shared_sparse_conv_apply(x, plan, rows_per_tile=4)
    pad = dilation * (kernel - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_shared_sparse_conv_odd_grid_falls_back_rows_per_tile():
    """Round-4 review: shared_sparse_conv_apply must degrade rows_per_tile
    to the largest divisor of h (like every sibling kernel) instead of
    asserting on odd feature grids (e.g. 300x300 inputs -> h=38)."""
    from tpuseg.ops.sparse_conv import (plan_shared_sparse_conv,
                                        shared_sparse_conv_apply)

    rng = np.random.default_rng(11)
    cin = cout = 256
    w = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    coarse = np.array([[1, 0], [1, 1]], dtype=np.float32)
    mask = np.broadcast_to(
        np.kron(coarse, np.ones((128, 128), np.float32)),
        (3, 3, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(1, 6, 16, cin)).astype(np.float32))
    plan = plan_shared_sparse_conv(w, mask, dilation=1, dtype=jnp.float32)
    y = shared_sparse_conv_apply(x, plan, rows_per_tile=4)  # 6 % 4 -> R=3
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=1, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_shared_plan_union_smaller_than_dense():
    from tpuseg.ops.sparse_conv import plan_shared_sparse_conv

    rng = np.random.default_rng(8)
    w = rng.normal(size=(3, 3, 512, 512)).astype(np.float32)
    # only K-blocks 0 and 2 used anywhere
    mask = np.zeros((512, 512), np.float32)
    mask[0:128] = 1
    mask[256:384, 0:128] = 1
    mask = np.broadcast_to(mask[None, None], (3, 3, 512, 512)).copy()
    plan = plan_shared_sparse_conv(w, mask, dilation=2, dtype=jnp.float32)
    assert plan.rows == (0, 2)
    assert plan.union_density == 0.5


def test_plan_rows_per_tile_is_honored():
    """fused_sparse_conv_apply must execute at plan.rows_per_tile unless the
    caller explicitly overrides (round-1 bug: the default of 8 silently
    swallowed the planned value, VERDICT.md weak item 1)."""
    from tpuseg.ops.sparse_conv import fused_sparse_conv_apply, plan_fused_sparse_conv

    rng = np.random.default_rng(10)
    cin = cout = 256
    w = rng.normal(size=(1, 1, cin, cout)).astype(np.float32)
    coarse = np.array([[1, 0], [1, 1]], dtype=np.float32)
    mask = np.kron(coarse, np.ones((128, 128), np.float32))[None, None]
    x = jnp.asarray(rng.normal(size=(1, 6, 16, cin)).astype(np.float32))

    # h=6 is divisible by the planned R=3 but not by the old default R=8:
    # the call below only succeeds if the plan's value is the one executed.
    plan = plan_fused_sparse_conv(w, mask, dtype=jnp.float32, rows_per_tile=3)
    assert plan.rows_per_tile == 3
    y = fused_sparse_conv_apply(x, plan)
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=1, padding=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)

    # an explicit override that does not divide h falls back to the largest
    # dividing tile height (odd feature grids, e.g. 300x300 inputs) and
    # still computes the right answer
    y2 = fused_sparse_conv_apply(x, plan, rows_per_tile=4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_int8_fused_sparse_conv_matches_masked_dense():
    # prune + quantize composition: int8 kernel vs f32 dense-masked conv
    from tpuseg.ops.sparse_conv import (
        fused_sparse_conv_apply_q,
        plan_fused_sparse_conv,
        quantize_fused_plan,
    )
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    rng = np.random.default_rng(0)
    C, H, W, DIL = 256, 32, 64, 2
    w = rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05
    m = prune_as_block(
        hwio_to_oihw(w),
        BlockConfig(0.875, 128, 128, -1, -1, collapse_tensor=False))
    mask = oihw_to_hwio(m).astype(np.float32)
    plan = plan_fused_sparse_conv(w * mask, mask, dilation=DIL)
    for x_scale in (None, 0.05):  # dynamic and static activation scales
        qplan = quantize_fused_plan(plan, x_scale=x_scale)
        # batch 3 with per-frame magnitudes: dynamic mode computes one
        # scale PER FRAME (outputs must not depend on batch composition,
        # and the kernel must dequantize each frame with its own scale)
        x = rng.normal(size=(3, H, W, C)).astype(np.float32)
        x *= np.asarray([0.5, 1.0, 2.0])[:, None, None, None]
        x = jnp.asarray(x)
        y = fused_sparse_conv_apply_q(x, qplan)
        ref = conv2d(x, jnp.asarray(w * mask), 1, DIL, DIL)
        for i in range(3):
            rel = float(jnp.max(jnp.abs(y[i] - ref[i]))
                        / jnp.max(jnp.abs(ref[i])))
            assert rel < 0.05, (x_scale, i, rel)  # two-sided int8 rounding
        if x_scale is None:
            # per-frame dynamic scale: a frame's result is identical when
            # served alone (no batch-composition dependence)
            y0 = fused_sparse_conv_apply_q(x[:1], qplan)
            np.testing.assert_array_equal(np.asarray(y0[0]),
                                          np.asarray(y[0]))


@pytest.mark.parametrize("dilation", [1, 2])
def test_phase_sparse_conv_matches(dilation):
    """Round-3 phase-shifted kernel: dx pre-shift in HBM + free H slices +
    per-tap f32 accumulation must equal the masked dense conv."""
    from tpuseg.ops.sparse_conv import (
        phase_sparse_conv_apply,
        plan_shared_sparse_conv,
    )

    rng = np.random.default_rng(7)
    cin = cout = 256
    k = 3
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    coarse = np.array([[1, 0], [1, 1]], dtype=np.float32)
    mask2d = np.kron(coarse, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (k, k, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_shared_sparse_conv(w, mask, dilation=dilation, dtype=np.float32)
    y = phase_sparse_conv_apply(x, plan, rows_per_tile=4)
    pad = dilation * (k - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_phase_sparse_conv_sparse_union():
    """With a genuinely sparse union the kernel computes at union density."""
    from tpuseg.ops.sparse_conv import (
        phase_sparse_conv_apply,
        plan_shared_sparse_conv,
    )

    rng = np.random.default_rng(8)
    cin, cout = 512, 256
    k = 3
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    # only K-blocks 1 and 3 live
    nz = np.zeros((4, 2), np.float32)
    nz[1, :] = 1
    nz[3, 0] = 1
    mask2d = np.kron(nz, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (k, k, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(1, 8, 16, cin)).astype(np.float32))
    plan = plan_shared_sparse_conv(w, mask, dilation=2, dtype=np.float32)
    assert plan.s == 2 and plan.union_density == 0.5
    y = phase_sparse_conv_apply(x, plan, rows_per_tile=8)
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=2, padding=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dilation", [1, 2])
def test_fused_phase_sparse_conv_matches(dilation):
    """Per-out-block phase kernel (phase pre-shift + per-column union)
    equals the masked dense conv."""
    from tpuseg.ops.sparse_conv import (
        fused_phase_sparse_conv_apply,
        plan_fused_sparse_conv,
    )

    rng = np.random.default_rng(9)
    cin, cout = 512, 256
    k = 3
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    nz = np.zeros((4, 2), np.float32)
    nz[1, 0] = 1
    nz[3, 1] = 1
    nz[0, 1] = 1
    mask2d = np.kron(nz, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (k, k, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_fused_sparse_conv(w, mask, dilation=dilation, dtype=np.float32)
    y = fused_phase_sparse_conv_apply(x, plan, rows_per_tile=4)
    pad = dilation * (k - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dilation", [1, 2])
def test_imcol_phase_sparse_conv_matches(dilation):
    """Direct-DMA im2col variant equals the masked dense conv."""
    from tpuseg.ops.sparse_conv import (
        imcol_phase_sparse_conv_apply,
        plan_fused_sparse_conv,
    )

    rng = np.random.default_rng(10)
    cin, cout = 512, 256
    k = 3
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    nz = np.zeros((4, 2), np.float32)
    nz[1, 0] = 1
    nz[3, 1] = 1
    nz[0, 1] = 1
    mask2d = np.kron(nz, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (k, k, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_fused_sparse_conv(w, mask, dilation=dilation, dtype=np.float32)
    y = imcol_phase_sparse_conv_apply(x, plan, rows_per_tile=4)
    pad = dilation * (k - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dilation", [1, 2])
def test_shared_concat_sparse_conv_matches(dilation):
    """Shared-union xmat + single wide dot equals the masked dense conv."""
    from tpuseg.ops.sparse_conv import (
        plan_shared_sparse_conv,
        shared_concat_sparse_conv_apply,
    )

    rng = np.random.default_rng(11)
    cin, cout = 512, 256
    k = 3
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    nz = np.zeros((4, 2), np.float32)
    nz[1, 0] = 1
    nz[3, 1] = 1
    mask2d = np.kron(nz, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (k, k, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_shared_sparse_conv(w, mask, dilation=dilation, dtype=np.float32)
    y = shared_concat_sparse_conv_apply(x, plan, rows_per_tile=4, out_split=2)
    pad = dilation * (k - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dilation", [1, 2])
def test_cphase_sparse_conv_matches(dilation):
    """Phase pre-shift + aligned concat + one dot equals masked dense."""
    from tpuseg.ops.sparse_conv import (
        cphase_sparse_conv_apply,
        plan_fused_sparse_conv,
    )

    rng = np.random.default_rng(12)
    cin, cout = 512, 256
    k = 3
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    nz = np.zeros((4, 2), np.float32)
    nz[1, 0] = 1
    nz[2, 1] = 1
    nz[0, 0] = 1
    mask2d = np.kron(nz, np.ones((128, 128), np.float32))
    mask = np.broadcast_to(mask2d, (k, k, cin, cout)).copy()
    x = jnp.asarray(rng.normal(size=(2, 8, 16, cin)).astype(np.float32))
    plan = plan_fused_sparse_conv(w, mask, dilation=dilation, dtype=np.float32)
    y = cphase_sparse_conv_apply(x, plan, rows_per_tile=4)
    pad = dilation * (k - 1) // 2
    ref = conv2d(x, jnp.asarray(w * mask), stride=1, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)
