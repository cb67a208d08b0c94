"""Polyphase stem: exact equality with the direct 7x7 stride-1 conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.models.drn import conv2d
from tpuseg.ops.polyphase import PolyphaseStem, depth_to_space, space_to_depth


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 4), 4)), np.asarray(x)
    )


@pytest.mark.parametrize("f", [2, 4])
def test_polyphase_matches_direct_conv(f):
    rng = np.random.default_rng(1)
    w7 = rng.normal(size=(7, 7, 3, 16)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))

    ref = conv2d(x, jnp.asarray(w7), stride=1, dilation=1, padding=3)
    ref = ref + jnp.asarray(bias)

    stem = PolyphaseStem(w7, bias, f=f, dtype=jnp.float32)
    out = stem(x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_polyphase_jits():
    rng = np.random.default_rng(2)
    w7 = rng.normal(size=(7, 7, 3, 16)).astype(np.float32)
    stem = PolyphaseStem(w7, None, f=4, dtype=jnp.float32)
    y = jax.jit(stem)(jnp.zeros((1, 64, 128, 3)))
    assert y.shape == (1, 64, 128, 16)


def test_polyphase_frontend_matches_direct():
    """The 3-stage frontend in s2d domain equals the direct folded path."""
    from tpuseg.models import init_drnseg
    from tpuseg.models.drnseg import drnseg_forward
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import PolyphaseFrontend

    rng = np.random.default_rng(3)
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    state = {
        k: (rng.random(v.shape).astype(np.float32) * 0.5 + 0.75
            if k.endswith("running_var")
            else rng.normal(size=v.shape).astype(np.float32) * 0.1)
        for k, v in state.items()
    }
    folded = fold_bn(params, state, spec)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    ref_logp, ref_seg, _ = jax.jit(
        lambda p, v: drnseg_forward(p, {}, v, spec, train=False)
    )(folded, x)

    frontend = PolyphaseFrontend(folded, dtype=jnp.float32)
    logp, seg, _ = jax.jit(
        lambda p, v: drnseg_forward(
            p, {}, v, spec, train=False, stem_fn=frontend, stem_stages=3
        )
    )(folded, x)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(ref_seg),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref_logp),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("f", [2, 4])
def test_polyphase_frontend_f_variants(f):
    from tpuseg.models import init_drnseg
    from tpuseg.models.drnseg import drnseg_forward
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import PolyphaseFrontend

    rng = np.random.default_rng(5)
    params, state, spec = init_drnseg(1, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    x = jnp.asarray(rng.random((1, 32, 64, 3), dtype=np.float32))
    ref_seg = jax.jit(
        lambda p, v: drnseg_forward(p, {}, v, spec, train=False)[1]
    )(folded, x)
    frontend = PolyphaseFrontend(folded, f=f, dtype=jnp.float32)
    seg = jax.jit(
        lambda p, v: drnseg_forward(
            p, {}, v, spec, train=False, stem_fn=frontend, stem_stages=3
        )[1]
    )(folded, x)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(ref_seg),
                               rtol=1e-3, atol=1e-3)


def test_space_to_depth_fast_path_exact():
    """The word-bitcast fast path must be bit-exact vs the 6D transpose for
    uint8/bfloat16 3-channel frames (the layouts the frame program feeds)."""
    import jax.numpy as jnp

    from tpuseg.ops import polyphase as pp

    rng = np.random.default_rng(0)

    def reference(x, f):
        n, h, w, c = x.shape
        y = np.asarray(x).reshape(n, h // f, f, w // f, f, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f, f * f * c)

    u8 = rng.integers(0, 255, size=(1, 16, 32, 3), dtype=np.uint8)
    out = np.asarray(pp.space_to_depth(jnp.asarray(u8), 4))
    np.testing.assert_array_equal(out, reference(u8, 4))

    bf = jnp.asarray(rng.normal(size=(1, 16, 32, 3)).astype(np.float32), jnp.bfloat16)
    out = np.asarray(pp.space_to_depth(bf, 4).astype(jnp.float32))
    np.testing.assert_array_equal(out, reference(np.asarray(bf.astype(jnp.float32)), 4))


def test_frontend_normalize_after_s2d_exact():
    """normalize folded into the frontend == normalize-then-frontend."""
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import PolyphaseFrontend

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    mean = np.array([0.290, 0.328, 0.287], np.float32)
    std = np.array([0.183, 0.187, 0.184], np.float32)

    stem_a = PolyphaseFrontend(folded)
    stem_b = PolyphaseFrontend(folded, normalize=(mean, std))

    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, size=(1, 32, 64, 3), dtype=np.uint8)
    xn = ((u8.astype(np.float32) / 255.0 - mean) / std).astype(np.float32)
    ya = np.asarray(stem_a(jnp.asarray(xn, jnp.bfloat16)).astype(jnp.float32))
    yb = np.asarray(stem_b(jnp.asarray(u8)).astype(jnp.float32))
    np.testing.assert_array_equal(ya, yb)


def test_fused_stage3_frontend_matches_direct():
    """Frontend extended through stage 3 == polyphase frontend + stage 3 on
    the direct path (BN-folded inference)."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.models.drnseg import drnseg_forward
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import FusedStage3Frontend, PolyphaseFrontend

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    mean = [0.290, 0.328, 0.287]
    std = [0.183, 0.187, 0.184]
    import jax.numpy as _jnp
    stem3 = PolyphaseFrontend(folded, normalize=(mean, std), dtype=_jnp.float32)
    stem4 = FusedStage3Frontend(folded, normalize=(mean, std), dtype=_jnp.float32)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 64, 128, 3),
                                      dtype=np.uint8))
    f32 = jnp.float32
    _, seg_a, _ = jax.jit(lambda f: drnseg_forward(
        folded, {}, f, spec, train=False, compute_dtype=f32,
        upsample=False, stem_fn=stem3, stem_stages=3))(frames)
    _, seg_b, _ = jax.jit(lambda f: drnseg_forward(
        folded, {}, f, spec, train=False, compute_dtype=f32,
        upsample=False, stem_fn=stem4, stem_stages=4))(frames)
    np.testing.assert_allclose(np.asarray(seg_a), np.asarray(seg_b),
                               rtol=1e-4, atol=1e-4)


def test_int8_stem_close_to_bf16():
    """int8_stem frontend stays within PTQ noise of the bf16 frontend;
    calibrate_stem_scales installs static scales (conv0's stays analytic)
    and the calibrated outputs stay in tolerance too."""
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import (
        FusedStage3Frontend,
        calibrate_stem_scales,
    )

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    mean = [0.290, 0.328, 0.287]
    std = [0.183, 0.187, 0.184]
    stem = FusedStage3Frontend(folded, normalize=(mean, std),
                               dtype=jnp.float32)
    stem_q = FusedStage3Frontend(folded, normalize=(mean, std),
                                 dtype=jnp.float32, int8_stem=True)
    assert stem_q.conv0_x_scale is not None  # analytic from normalize

    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 255, size=(2, 32, 64, 3), dtype=np.uint8)
    y = np.asarray(stem(jnp.asarray(u8)))
    yq = np.asarray(stem_q(jnp.asarray(u8)))
    assert yq.shape == y.shape
    denom = np.abs(y).max()
    assert np.abs(yq - y).max() / denom < 0.08

    scales = calibrate_stem_scales(stem_q, [u8])
    assert len(scales) == 3 and scales[0] == stem_q.conv0_x_scale
    assert stem_q.stem_x_scales == scales
    ys = np.asarray(stem_q(jnp.asarray(u8)))
    assert np.abs(ys - y).max() / denom < 0.08


def test_space_to_depth_flat_bit_exact():
    """Flat-row input (n, h, w*c) produces bit-identical s2d output."""
    import jax.numpy as jnp

    from tpuseg.ops.polyphase import space_to_depth, space_to_depth_flat

    rng = np.random.default_rng(3)
    for h, w, c, f in [(32, 64, 3, 4), (16, 32, 3, 2), (8, 8, 1, 2)]:
        x = rng.integers(0, 255, size=(2, h, w, c), dtype=np.uint8)
        ref = np.asarray(space_to_depth(jnp.asarray(x), f))
        flat = np.asarray(
            space_to_depth_flat(jnp.asarray(x.reshape(2, h, w * c)), f, c)
        )
        np.testing.assert_array_equal(ref, flat)


def test_frontend_accepts_flat_frames():
    """PolyphaseFrontend / FusedStage3Frontend on flat (n, h, w*3) frames
    match the 4-D frame path exactly."""
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.polyphase import FusedStage3Frontend, PolyphaseFrontend

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    mean = [0.290, 0.328, 0.287]
    std = [0.183, 0.187, 0.184]
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 255, size=(1, 32, 64, 3), dtype=np.uint8)
    flat = u8.reshape(1, 32, 64 * 3)
    for cls in (PolyphaseFrontend, FusedStage3Frontend):
        stem = cls(folded, normalize=(mean, std), dtype=jnp.float32)
        y4 = np.asarray(stem(jnp.asarray(u8)))
        y3 = np.asarray(stem(jnp.asarray(flat)))
        np.testing.assert_array_equal(y4, y3)


def test_refold_matches_s2d():
    """s2d(4) + refold(4->2) == s2d(2), exactly."""
    import jax.numpy as jnp

    from tpuseg.ops.polyphase import refold, space_to_depth

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(refold(space_to_depth(x, 4), 4, 2)),
        np.asarray(space_to_depth(x, 2)),
    )


def test_fold_conv_poly_general():
    """Generalized fold: matches fold_conv_poly when stride*f_out == f_in,
    and the folded-grid-stride case (f2 input -> f2 output grid, stride-2
    conv) matches the direct conv + s2d."""
    import jax
    import jax.numpy as jnp

    from tpuseg.ops.polyphase import (
        fold_conv_poly,
        fold_conv_poly_general,
        space_to_depth,
    )

    rng = np.random.default_rng(11)
    w = rng.normal(size=(3, 3, 2, 5)).astype(np.float32)
    wp1, lo1, hi1 = fold_conv_poly(w, 2, 1, 4, 2)
    wp2, sf, lo2, hi2 = fold_conv_poly_general(w, 2, 1, 4, 2)
    assert sf == 1 and (lo1, hi1) == (lo2, hi2)
    np.testing.assert_array_equal(wp1, wp2)

    def conv(x, w, stride, pad_lo, pad_hi):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad_lo, pad_hi), (pad_lo, pad_hi)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.asarray(rng.normal(size=(1, 32, 48, 2)).astype(np.float32))
    y_ref = space_to_depth(conv(x, jnp.asarray(w), 2, 1, 1), 2)
    wp, sf, plo, phi = fold_conv_poly_general(w, 2, 1, 2, 2)
    assert sf == 2
    y = conv(space_to_depth(x, 2), jnp.asarray(wp), sf, plo, phi)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
