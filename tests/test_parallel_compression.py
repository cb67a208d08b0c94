"""Mesh x compression composition (round-4 verdict task 3).

Every axis works alone — data mesh, sparse plans, int8 PTQ, masks, remat,
sparse-exec training; these tests pin the MATRIX on the 8-virtual-device
CPU mesh, where silent breakage (sharded batch shapes hitting
plan-geometry asserts, GSPMD failing to partition a lowered conv) would
otherwise ship.  Reference capability being composed:
semantic_seg_multigpu.py:460-526 + pruner dispatch :533-557 — the
reference prunes AND distributes in one trainer.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import VENDORED_CONFIGS

MEAN, STD = [0.29, 0.33, 0.29], [0.18, 0.19, 0.18]


def _mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs[:8]), ("data",))


def _coarse_masks(params, layers, sparsity):
    from tpuseg.sparsity.base import hwio_to_oihw, oihw_to_hwio
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    masks = {}
    for name in layers:
        w = hwio_to_oihw(np.asarray(params[name]))
        m = prune_as_block(
            w, BlockConfig(sparsity, 128, 128, -1, -1, collapse_tensor=False)
        )
        masks[name] = oihw_to_hwio(m).astype(np.float32)
    return masks


@pytest.mark.slow
def test_mesh_sparse_serving_ids_equal():
    """Batch-sharded serving THROUGH the gathered-exact sparse lowering
    (the shipped default) produces ids identical to single-device."""
    from tpuseg.models import init_drnseg
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.sparsity import apply_masks
    from tpuseg.video import SyntheticFrames, VideoSegmenter

    mesh = _mesh8()
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    layers = ["layer.6.0.conv1.weight", "layer.7.0.weight"]
    masks = _coarse_masks(params, layers, 0.875)
    params = dict(apply_masks(params, masks))
    folded = fold_bn(params, state, spec)
    plans, report = build_sparse_plans(
        folded, masks, spec, dtype=jnp.float32,
        lowering="gathered", gathered_mode="exact",
    )
    assert set(plans) == {l[: -len(".weight")] for l in layers}, report

    kw = dict(compute_dtype=None, batch=8, exec_plans=plans)
    frames = list(SyntheticFrames(8, (64, 64)))
    seg_m = VideoSegmenter(params, state, spec, MEAN, STD, mesh=mesh, **kw)
    seg_1 = VideoSegmenter(params, state, spec, MEAN, STD, **kw)
    out_m = seg_m.run(frames, warmup=False, need_color=False)
    out_1 = seg_1.run(frames, warmup=False, need_color=False)
    np.testing.assert_array_equal(out_m["ids"], out_1["ids"])


@pytest.mark.slow
def test_mesh_quantized_serving_ids_agree():
    """Batch-sharded int8 PTQ serving vs single-device int8 serving.

    Not bit-equal by design: the QuantConv rescale reductions reassociate
    under GSPMD partitioning and RANDOM-weight logits are full of argmax
    near-ties (measured 0.5% flipped pixels); the contract is agreement
    within the int8 path's own noise floor."""
    from tpuseg.models import init_drnseg
    from tpuseg.video import SyntheticFrames, VideoSegmenter

    mesh = _mesh8()
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    frames = list(SyntheticFrames(8, (64, 64)))
    kw = dict(compute_dtype=None, batch=8, quantize=True,
              calib_frames=frames[:4])
    seg_m = VideoSegmenter(params, state, spec, MEAN, STD, mesh=mesh, **kw)
    seg_1 = VideoSegmenter(params, state, spec, MEAN, STD, **kw)
    out_m = seg_m.run(frames, warmup=False, need_color=False)
    out_1 = seg_1.run(frames, warmup=False, need_color=False)
    agr = (np.asarray(out_m["ids"]) == np.asarray(out_1["ids"])).mean()
    assert agr >= 0.99, agr


@pytest.mark.slow
def test_cli_mesh_sparse_quant_smoke(capsys):
    """The CLI flag path: --mesh-devices 8 + vendored block128reg config +
    --quantize together (the exact composition the verdict flagged as
    never exercised)."""
    from tpuseg.cli.seg_video import main

    main([
        "--video", "shapes:7", "--size", "64x64", "--frames", "8",
        "--batch", "8", "--mesh-devices", "8", "--quantize",
        "--calibrate", "4", "--dtype", "float32", "--pr-config-path",
        os.path.join(
            VENDORED_CONFIGS, "drn_d_22", "drn_d_22_block128reg_87.50.json"
        ),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    lines = [json.loads(l) for l in out if l.startswith("{")]
    plans_line = next(l for l in lines if l.get("event") == "sparse_plans")
    assert plans_line["lowered"] >= 8
    result = lines[-1]
    assert result["frames"] == 8
    assert result["fps"] > 0


@pytest.mark.slow
def test_mesh_sparse_exec_train_matches_single():
    """sparse-exec TRAINING over the data mesh: the custom-VJP fused
    kernel (interpret mode on CPU) partitions under GSPMD and the step
    matches the single-device sparse step."""
    from tpuseg.models import init_drnseg
    from tpuseg.ops.sparse_train import build_sparse_train_structs
    from tpuseg.parallel import replicate, shard_batch, shard_train_step
    from tpuseg.train import create_train_state, make_seg_train_step, make_sgd

    mesh = _mesh8()
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    layers = ["layer.6.0.conv1.weight", "layer.7.0.weight"]
    masks = _coarse_masks(params, layers, 0.75)
    structs, report = build_sparse_train_structs(masks, spec)
    assert set(structs) == {l[: -len(".weight")] for l in layers}, report

    tx = make_sgd(lambda _: 0.005, 0.9, 1e-4)
    step = make_seg_train_step(spec, tx, compute_dtype=None,
                               sparse_plans=structs)
    rng = np.random.default_rng(11)
    images = rng.random((8, 32, 32, 3), dtype=np.float32)
    labels = rng.integers(0, 19, size=(8, 32, 32)).astype(np.int32)

    ts1 = create_train_state(params, state, tx, masks)
    _, m1 = jax.jit(step)(ts1, jnp.asarray(images), jnp.asarray(labels))

    tsm = replicate(mesh, create_train_state(params, state, tx, masks))
    step_m = shard_train_step(step, mesh, donate_state=False)
    tsm2, mm = step_m(tsm, shard_batch(mesh, jnp.asarray(images)),
                      shard_batch(mesh, jnp.asarray(labels)))
    np.testing.assert_allclose(float(mm["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    assert int(np.asarray(tsm2.step)) == 1


@pytest.mark.slow
def test_cli_train_mesh_masks_remat_matches_single(tmp_path):
    """Trainer CLI with masks + mesh + --remat together: the 8-device run
    produces the same trained weights as the single-device run (global
    batch semantics — BN stats and the loss mean span the full batch
    either way)."""
    from tpuseg.cli.semantic_seg import main as seg_main
    from tpuseg.train import load_checkpoint

    cfg = os.path.join(
        VENDORED_CONFIGS, "drn_d_22", "drn_d_22_512X512_0.00_50.00.json")

    def run(mesh_devices, save):
        seg_main([
            "train", "--synthetic", "8", "-s", "32", "--batch-size", "8",
            "--epochs", "1", "--dtype", "float32", "--remat",
            "--mc-pruning", "--pr-static", "--pr-config-path", cfg,
            "--mesh-devices", str(mesh_devices), "--save-dir", save,
        ])
        p, s, m, _, meta = load_checkpoint(os.path.join(save, "checkpoint.npz"))
        return p, s, m

    p8, s8, m8 = run(8, str(tmp_path / "mesh8"))
    p1, s1, m1 = run(1, str(tmp_path / "mesh1"))
    assert set(m8) == set(m1)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p8[k]), np.asarray(p1[k]), rtol=2e-3, atol=1e-5,
            err_msg=k,
        )
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m8[k]), np.asarray(m1[k]))


def test_mesh_rejects_pallas_plans_with_valueerror():
    """Pallas-backed exec plans are opaque custom calls GSPMD cannot
    partition; serving over a mesh must reject them with a catchable
    ValueError (not a bare assert, which -O strips) that points at the
    gathered lowering."""
    from tpuseg.models import init_drnseg
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.sparsity import apply_masks
    from tpuseg.video import VideoSegmenter

    mesh = _mesh8()
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    layers = ["layer.6.0.conv1.weight"]
    masks = _coarse_masks(params, layers, 0.875)
    params = dict(apply_masks(params, masks))
    folded = fold_bn(params, state, spec)
    plans, report = build_sparse_plans(
        folded, masks, spec, dtype=jnp.float32, lowering="pallas")
    assert plans, report
    with pytest.raises(ValueError, match="gathered"):
        VideoSegmenter(params, state, spec, MEAN, STD, mesh=mesh,
                       compute_dtype=None, batch=8, exec_plans=plans)
