"""Int8 PTQ serving mode (tpuseg.ops.quant): plan construction, numeric
sanity vs the bf16 path, calibration, CLI wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from tpuseg.models import init_drnseg
from tpuseg.models.drnseg import drnseg_forward
from tpuseg.ops.fold_bn import fold_bn
from tpuseg.ops.quant import (
    QuantConv,
    build_quant_plans,
    calibrate_scales,
    ids_agreement,
    quantize_weight,
)


def test_quantize_weight_roundtrip(rng):
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == np.int8 and scale.shape == (16,)
    deq = wq.astype(np.float32) * scale
    assert np.abs(deq - w).max() <= np.abs(w).max() / 127.0 + 1e-6


def test_quant_conv_matches_float(rng):
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32) * 0.1
    wq, scale = quantize_weight(w)
    plan = QuantConv(jnp.asarray(wq), jnp.asarray(scale),
                     stride=1, dilation=2, padding=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32))
    y = plan.apply(x)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel  # ~2x 8-bit rounding through the conv


def test_end_to_end_quantized_forward(rng):
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    plans = build_quant_plans(folded, spec)
    # drn_d_22 stages 5-8: layer5 2 blocks x2 convs eligible at >=128ch?
    # layer5 is 256ch, layers 6-8 512ch -> all stride-1 convs qualify
    assert len(plans) >= 6, sorted(plans)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    ref, _, _ = drnseg_forward(folded, {}, x, spec, train=False)
    q, _, _ = drnseg_forward(folded, {}, x, spec, train=False,
                             sparse_plans=plans)
    ids_ref = np.asarray(jnp.argmax(ref, -1))
    ids_q = np.asarray(jnp.argmax(q, -1))
    agree = ids_agreement(ids_ref, ids_q)
    assert agree > 0.95, agree


def test_calibrated_static_scales(rng):
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = fold_bn(params, state, spec)
    plans = build_quant_plans(folded, spec)
    frames = [rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
              for _ in range(2)]
    scales = calibrate_scales(folded, {}, spec, frames, plans=plans,
                              compute_dtype=None)
    assert set(scales) == set(plans)
    assert all(v > 0 for v in scales.values())
    static = build_quant_plans(folded, spec, x_scales=scales)
    assert all(static[n].x_scale is not None for n in static)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    q, _, _ = drnseg_forward(folded, {}, x, spec, train=False,
                             sparse_plans=static)
    assert np.isfinite(np.asarray(q)).all()


def test_video_segmenter_quantized(rng):
    from tpuseg.video import SyntheticFrames, VideoSegmenter

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    seg = VideoSegmenter(params, state, spec, [0.29, 0.33, 0.29],
                         [0.18, 0.19, 0.18], compute_dtype=None, batch=2,
                         quantize=True)
    out = seg.run(SyntheticFrames(2, (64, 64)), warmup=False)
    assert out["ids"].shape == (2, 64, 64)
    assert out["ids"].max() < 19


def test_video_segmenter_calibrated(rng):
    from tpuseg.video import SyntheticFrames, VideoSegmenter

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    calib = list(SyntheticFrames(2, (64, 64)))
    seg = VideoSegmenter(params, state, spec, [0.29, 0.33, 0.29],
                         [0.18, 0.19, 0.18], compute_dtype=None, batch=2,
                         quantize=True, calib_frames=calib)
    out = seg.run(SyntheticFrames(2, (64, 64)), warmup=False)
    assert out["ids"].shape == (2, 64, 64)


def test_video_segmenter_with_exec_plans(rng):
    """Serving a pruned model through VideoSegmenter via exec_plans."""
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn as _fold
    from tpuseg.sparsity import apply_masks
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block
    from tpuseg.video import SyntheticFrames, VideoSegmenter
    import tpuseg.ops.sparse_conv as sc
    import jax.experimental.pallas as pl

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    folded = _fold(params, state, spec)
    name = "layer.6.0.conv1.weight"
    w = hwio_to_oihw(np.asarray(folded[name]))
    m = prune_as_block(
        w, BlockConfig(0.875, 128, 128, -1, -1, collapse_tensor=False))
    masks = {name: oihw_to_hwio(m).astype(np.float32)}
    masked = apply_masks(folded, masks)
    plans, _ = build_sparse_plans(masked, masks, spec)
    assert plans

    orig = pl.pallas_call
    sc.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        seg = VideoSegmenter(dict(masked), {}, spec, [0.29, 0.33, 0.29],
                             [0.18, 0.19, 0.18], compute_dtype=None, batch=2,
                             fold_batchnorm=False, exec_plans=plans)
        out = seg.run(SyntheticFrames(2, (64, 64)), warmup=False)
    finally:
        sc.pl.pallas_call = orig
    assert out["ids"].shape == (2, 64, 64)


def test_calibration_non_multiple_of_8_size(rng):
    """--quantize --calibrate at sizes the polyphase stem rejects (e.g.
    the reference's default 300x300) must calibrate on the non-stem path
    instead of crashing (review finding)."""
    from tpuseg.video import SyntheticFrames, VideoSegmenter

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    calib = list(SyntheticFrames(2, (36, 36)))  # 36 % 8 != 0
    seg = VideoSegmenter(params, state, spec, [0.29, 0.33, 0.29],
                         [0.18, 0.19, 0.18], compute_dtype=None, batch=2,
                         quantize=True, calib_frames=calib)
    out = seg.run(SyntheticFrames(2, (36, 36)), warmup=False)
    assert out["ids"].shape == (2, 36, 36)
