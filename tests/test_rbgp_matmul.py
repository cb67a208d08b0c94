"""RBGP structured lowering: detection, routing, and numerical parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.models.drn import conv2d
from tpuseg.ops.rbgp_matmul import (
    detect_structure,
    plan_rbgp,
    rbgp_conv_apply,
)
from tpuseg.sparsity.patterns import generate_sparsity_pattern
from tpuseg.sparsity.srmbrep import SRMBRepConfig, construct_srmbrep_mask


def _srmb_mask(shape_oihw, ipat, isp=0.5, ibh=1, ibw=1, ph=32, pw=32, seed=0):
    cfg = SRMBRepConfig(
        obh=-1, obw=-1, cbh=ph * ibh, cbw=pw * ibw, ibh=ibh, ibw=ibw,
        osp=0.0, opat="RAMANUJAN", isp=isp, ipat=ipat,
        is_repetitive=True, collapse_tensor=True,
    )
    t = np.zeros(shape_oihw, np.float32)
    m = construct_srmbrep_mask(t, cfg, np.random.default_rng(seed))
    return m  # OIHW


def _to_hwio(m_oihw):
    return np.transpose(m_oihw, (2, 3, 1, 0))


def test_detect_periodic_structure():
    m = _srmb_mask((128, 128, 3, 3), "RAMANUJAN", ph=32, pw=32)
    collapsed = m.reshape(128, -1)
    s = detect_structure(collapsed)
    assert s is not None
    assert s.pr == 32
    # column period divides 32 (CB tiling can shrink it)
    assert 32 % s.pc == 0 or s.pc % 32 == 0
    assert 0.4 < s.density < 0.6


def test_plan_routes_ramanujan_to_dense():
    m = _srmb_mask((128, 128, 3, 3), "RAMANUJAN")
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 3, 128, 128)).astype(np.float32)
    plan = plan_rbgp(w, _to_hwio(m))
    assert plan.kind == "dense"
    assert "dense" in plan.note or "expander" in plan.note


def test_plan_column_compact_matches_masked_dense():
    # COLUMN inner pattern on a 1x1 conv: whole input channels dead
    m = _srmb_mask((128, 128, 1, 1), "COLUMN", isp=0.5)
    mh = _to_hwio(m)
    rng = np.random.default_rng(2)
    w = rng.normal(size=(1, 1, 128, 128)).astype(np.float32)
    plan = plan_rbgp(w, mh, dtype=jnp.float32)
    assert plan.kind == "column_compact"
    assert plan.weights.shape[2] == 64  # half the input channels survive

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)).astype(np.float32))
    y = rbgp_conv_apply(x, plan)
    ref = conv2d(x, jnp.asarray(w * mh), stride=1, dilation=1, padding=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_plan_tap_compact_matches_masked_dense():
    # COLUMN inner pattern on a 3x3 conv with collapse_tensor=True: the
    # dead collapsed columns interleave channel and tap -> per-tap compact
    m = _srmb_mask((128, 128, 3, 3), "COLUMN", isp=0.5)
    mh = _to_hwio(m)
    rng = np.random.default_rng(5)
    w = rng.normal(size=(3, 3, 128, 128)).astype(np.float32)
    plan = plan_rbgp(w, mh, dtype=jnp.float32)
    assert plan.kind == "tap_compact"
    assert all(len(live) <= 80 for _, _, live in plan.taps)

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)).astype(np.float32))
    y = rbgp_conv_apply(x, plan, dilation=2)
    ref = conv2d(x, jnp.asarray(w * mh), stride=1, dilation=2, padding=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_plan_grouped_conv_matches_masked_dense():
    # GROUP inner pattern at ibh=ibw=4 with P=8x8, 50% -> 4 diagonal groups
    m = _srmb_mask((128, 128, 1, 1), "GROUP", isp=0.5, ibh=4, ibw=4,
                   ph=8, pw=8)
    mh = _to_hwio(m)
    rng = np.random.default_rng(3)
    w = rng.normal(size=(1, 1, 128, 128)).astype(np.float32)
    plan = plan_rbgp(w, mh, dtype=jnp.float32)
    assert plan.kind == "grouped_conv"
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 128)).astype(np.float32))
    y = rbgp_conv_apply(x, plan)
    ref = conv2d(x, jnp.asarray(w * mh), stride=1, dilation=1, padding=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
