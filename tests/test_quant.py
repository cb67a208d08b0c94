"""Int8 PTQ serving mode (tpuseg.ops.quant): plan construction, numeric
sanity vs the bf16 path, calibration, CLI wiring."""

import numpy as np
import pytest

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


def test_quant_plans_built_for_classifier_naming(rng):
    """Round-4 review: cls-named specs have stage keys 'layer5' (no dot);
    the old parse raised and silently produced ZERO plans, so rmbsnn's
    'int8' evaluation actually ran fp."""
    from tpuseg.models.drn import build_drn_spec, init_drn
    from tpuseg.ops.fold_bn import fold_bn

    spec = build_drn_spec("drn_d_22", num_classes=10, naming="cls")
    params, state = init_drn(0, spec)
    folded = fold_bn(params, state, spec)
    plans = build_quant_plans(folded, spec)
    assert len(plans) >= 6, sorted(plans)
    assert all(not k.startswith("layer.") for k in plans)
    # and the classifier forward yields real logits on small inputs (the
    # fixed AvgPool(pool_size) window emitted ZERO windows below 224,
    # silently returning (B, 0) logits)
    from tpuseg.models.drn import drn_forward

    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    out = drn_forward(folded, {}, x, spec, train=False,
                      sparse_plans=plans)[0]
    assert out.shape == (2, 10), out.shape


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


def test_cls_quant_plans_close(rng):
    """Classifier-side int8 serving (VERDICT r2 #9): cifar_resnet20 routed
    through per-layer QuantConv plans tracks the float forward."""
    import jax.numpy as jnp

    from tpuseg.models.cifar import cifar_forward, create_cifar_model
    from tpuseg.ops.quant import build_cls_quant_plans

    params, state, spec = create_cifar_model(0, "cifar_resnet20", 10)
    plans = build_cls_quant_plans(params)
    # every non-stem conv has >=16 in/out channels -> all eligible
    assert len(plans) >= 20
    assert "conv1" not in plans  # 3-channel stem excluded
    x = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(cifar_forward(params, state, x, spec)[0])
    q = np.asarray(cifar_forward(params, state, x, spec, plans=plans)[0])
    assert ref.shape == q.shape == (8, 10)
    # int8 changes numerics but must stay close on random weights
    assert float(np.abs(ref - q).max()) < 0.15 * float(np.abs(ref).max())


def test_cls_quant_plans_tvresnet(rng):
    """Plan dispatch also covers the torchvision-style family (resnet18
    shape, stride-2 call sites skip their plans)."""
    import jax.numpy as jnp

    from tpuseg.models.cifar import cifar_forward, create_cifar_model
    from tpuseg.ops.quant import build_cls_quant_plans

    params, state, spec = create_cifar_model(0, "cifar_resnet18", 10)
    plans = build_cls_quant_plans(params, min_channels=64)
    assert plans
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(cifar_forward(params, state, x, spec)[0])
    q = np.asarray(cifar_forward(params, state, x, spec, plans=plans)[0])
    assert np.isfinite(q).all()
    assert float(np.abs(ref - q).max()) < 0.2 * float(np.abs(ref).max())


@pytest.mark.slow
def test_rmbsnn_evaluate_quantize(tmp_path, capsys):
    """CLI: --evaluate --quantize reports float + int8 top-1 and agreement."""
    import json as _json

    from tpuseg.cli.rmbsnn import main as cls_main

    cls_main([
        "--dataset", "synthetic", "--synthetic-n", "64", "--batch-size", "32",
        "--arch", "cifar_resnet20", "--evaluate", "--quantize",
        "--save-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    blob = _json.loads(out[-1])
    assert "acc1" in blob and "int8_acc1" in blob
    assert blob["int8_layers"] >= 20
    assert 0.0 <= blob["pred_agreement"] <= 1.0


@pytest.mark.parametrize("arch", ["cifar_vgg11_bn", "cifar_wrn_16_4"])
def test_cls_quant_plans_vgg_wrn(rng, arch):
    """Round-3 BACKLOG #7: the vgg/rvgg/wrn families route through the same
    per-layer exec-plan dispatch as the resnet families (previously
    NotImplementedError)."""
    import jax.numpy as jnp

    from tpuseg.models.cifar import cifar_forward, create_cifar_model
    from tpuseg.ops.quant import build_cls_quant_plans

    params, state, spec = create_cifar_model(0, arch, 10)
    plans = build_cls_quant_plans(params)
    assert plans, f"no eligible convs found for {arch}"
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(cifar_forward(params, state, x, spec)[0])
    q = np.asarray(cifar_forward(params, state, x, spec, plans=plans)[0])
    assert np.isfinite(q).all()
    assert float(np.abs(ref - q).max()) < 0.2 * float(np.abs(ref).max())
