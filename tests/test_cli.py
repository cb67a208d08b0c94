"""End-to-end CLI tests on a fabricated miniature Cityscapes-format dataset
(file lists + info.json), covering train, test, multi-scale test, save-vis,
and the sweeper."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from conftest import VENDORED_CONFIGS
from tpuseg.cli.semantic_seg import main as seg_main
from tpuseg.cli.expander_batch import main as sweep_main


@pytest.fixture()
def mini_cityscapes(tmp_path):
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "img", exist_ok=True)
    for phase, n in [("train", 4), ("val", 2)]:
        names_i, names_l = [], []
        for i in range(n):
            img = rng.integers(0, 255, size=(32, 64, 3), dtype=np.uint8)
            lbl = rng.integers(0, 19, size=(32, 64)).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / "img" / f"{phase}{i}.png")
            Image.fromarray(lbl).save(tmp_path / "img" / f"{phase}{i}_l.png")
            names_i.append(f"img/{phase}{i}.png")
            names_l.append(f"img/{phase}{i}_l.png")
        (tmp_path / f"{phase}_images.txt").write_text("\n".join(names_i))
        (tmp_path / f"{phase}_labels.txt").write_text("\n".join(names_l))
    (tmp_path / "info.json").write_text(
        json.dumps({"mean": [0.29, 0.33, 0.29], "std": [0.18, 0.19, 0.18]})
    )
    return tmp_path


@pytest.mark.slow
def test_train_and_test_on_files(mini_cityscapes, tmp_path):
    save = str(tmp_path / "run")
    seg_main([
        "train", "-d", str(mini_cityscapes), "-s", "32",
        "--batch-size", "2", "--epochs", "1", "--dtype", "float32",
        "--save-dir", save,
    ])
    assert os.path.exists(os.path.join(save, "checkpoint.npz"))
    seg_main([
        "test", "-d", str(mini_cityscapes), "--batch-size", "2",
        "--dtype", "float32",
        "--pretrained", os.path.join(save, "checkpoint.npz"),
        "--save-dir", save,
    ])


@pytest.mark.slow
def test_multiscale_test_and_savevis(mini_cityscapes, tmp_path, capsys):
    save = str(tmp_path / "ms")
    seg_main([
        "test", "-d", str(mini_cityscapes), "--ms", "--scales", "0.5,1.5",
        "--dtype", "float32", "--save-dir", save, "--save-vis",
    ])
    out = capsys.readouterr().out
    assert "miou" in out
    pred_dir = os.path.join(save, "pred", "img")
    color_dir = os.path.join(save, "pred_color", "img")
    assert len(os.listdir(pred_dir)) == 2
    assert len(os.listdir(color_dir)) == 2
    # colorized output is RGB, id output is single channel
    c = np.asarray(Image.open(os.path.join(color_dir, os.listdir(color_dir)[0])))
    assert c.ndim == 3 and c.shape[2] == 3


def test_calc(capsys):
    seg_main(["calc", "--crop-size", "64"])
    out = capsys.readouterr().out
    blob = json.loads(out.strip().splitlines()[-1])
    assert blob["params"] > 15_000_000  # DRN-D-22 seg ~16M params


def test_sweeper_dry_run(tmp_path, capsys):
    sweep_main([
        "--dataset", "cityscapes", "--arch", "drn_d_22",
        "--sparsities", "0.5", "--iblocks", "1x1",
        "--out-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "semantic_seg train" in out
    cfgs = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert len(cfgs) == 1
    cfg = json.loads((tmp_path / cfgs[0]).read_text())
    assert cfg["pruner_type"] == "srmbrep"
    layers = [c["layer_set"][0] for c in cfg["configs"]]
    assert "layer.0.0.weight" not in layers  # first conv excluded
    assert all(not l.startswith(("seg", "up", "fc")) for l in layers)


def test_seg_video_shapes_source(capsys):
    """--video shapes[:seed]: the built-in zero-asset synthetic video —
    the demo runs with no video file, codec, or reference mirror."""
    import json as _json

    from tpuseg.cli.seg_video import main

    main(["--video", "shapes:7", "--size", "64x64", "--frames", "4",
          "--batch", "2"])
    result = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["frames"] == 4
    assert result["fps"] > 0


@pytest.mark.slow
def test_seg_video_pruned_serving(capsys):
    """seg_video --pr-config-path: reference-schema config -> masks ->
    (plans or dense-masked) serving.  Fine RBGP blocklets coarsen to dense
    (documented), so this runs on CPU without Pallas kernels."""
    import json as _json
    import os

    import pytest as _pytest

    video = "/root/reference/sample.mp4"
    if not os.path.exists(video):
        _pytest.skip("reference sample video absent")

    from tpuseg.cli.seg_video import main

    main([
        "--video", video, "--size", "64x64", "--frames", "4",
        "--batch", "2", "--pr-config-path",
        os.path.join(
            VENDORED_CONFIGS, "drn_d_22", "drn_d_22_512X512_0.00_50.00.json"
        ),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    lines = [_json.loads(ln) for ln in out if ln.startswith("{")]
    plans_line = next(
        ln for ln in lines if ln.get("event") == "sparse_plans")
    result = lines[-1]
    assert plans_line["total_masked"] == 24
    assert result["frames"] == 4


@pytest.mark.slow
def test_baseline_trainer_converges(mini_cityscapes, tmp_path, capsys):
    """2-epoch semseg_baseline run on the fabricated dataset: the train
    loss must decrease (closes the one CLI that was only smoke-driven)."""
    from tpuseg.cli.semseg_baseline import main as baseline_main

    save = str(tmp_path / "base")
    baseline_main([
        "train", "-d", str(mini_cityscapes), "-s", "32",
        "--arch", "drn_d_22", "--batch-size", "2", "--epochs", "2",
        "--lr", "0.02", "--dtype", "float32", "--save-dir", save,
        "--eval-every", "2",
    ])
    lines = [
        json.loads(l) for l in capsys.readouterr().out.splitlines()
        if l.startswith("{") and "train_loss" in l
    ]
    assert len(lines) == 2
    assert lines[1]["train_loss"] < lines[0]["train_loss"], lines
    assert os.path.exists(os.path.join(save, "checkpoint.npz"))


@pytest.mark.slow
def test_train_orbax_ckpt_and_resume(mini_cityscapes, tmp_path):
    """--ckpt-format orbax: async orbax envelope saves per epoch, resume
    restores epoch/params from the directory checkpoint (BACKLOG #8)."""
    save = str(tmp_path / "orun")
    seg_main([
        "train", "-d", str(mini_cityscapes), "-s", "32",
        "--batch-size", "2", "--epochs", "1", "--dtype", "float32",
        "--save-dir", save, "--ckpt-format", "orbax",
    ])
    ckpt = os.path.join(save, "checkpoint.orbax")
    assert os.path.isdir(ckpt)
    from tpuseg.train import load_checkpoint

    assert load_checkpoint(ckpt)[4]["epoch"] == 1
    seg_main([
        "train", "-d", str(mini_cityscapes), "-s", "32",
        "--batch-size", "2", "--epochs", "2", "--dtype", "float32",
        "--save-dir", save, "--ckpt-format", "orbax", "--resume", ckpt,
    ])
    assert load_checkpoint(ckpt)[4]["epoch"] == 2


@pytest.mark.slow
def test_seg_video_temporal_warp(capsys):
    """seg_video --temporal 2 --temporal-warp --temporal-report: the
    motion-compensated reuse mode runs end to end on real video and
    reports its fidelity."""
    import json as _json
    import os

    video = "/root/reference/sample.mp4"
    if not os.path.exists(video):
        pytest.skip("reference sample video absent")

    from tpuseg.cli.seg_video import main

    main([
        "--video", video, "--size", "128x128", "--frames", "8",
        "--batch", "4", "--temporal", "2", "--temporal-warp",
        "--temporal-report",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    result = _json.loads(out[-1])
    assert result["frames"] == 8
    assert result["temporal_interval"] == 2
    assert result["temporal_warp"] is True
    assert 0.0 < result["temporal_ids_agreement"] <= 1.0


@pytest.mark.slow
def test_seg_video_budget_warp(capsys):
    """seg_video --temporal-thresh --temporal-budget --temporal-warp: the
    motion-compensated budgeted mode runs end to end on real video."""
    import json as _json
    import os

    video = "/root/reference/sample.mp4"
    if not os.path.exists(video):
        pytest.skip("reference sample video absent")

    from tpuseg.cli.seg_video import main

    main([
        "--video", video, "--size", "128x128", "--frames", "8",
        "--batch", "4", "--temporal-thresh", "8",
        "--temporal-budget", "2", "--temporal-warp", "--temporal-report",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    result = _json.loads(out[-1])
    assert result["frames"] == 8
    assert result["temporal_budget"] == 2
    assert result["temporal_warp"] is True
    assert 0.0 < result["temporal_ids_agreement"] <= 1.0
    assert 0.0 < result["promotion_rate"] <= 1.0


@pytest.mark.slow
def test_semantic_seg_sparse_exec_smoke(tmp_path, capsys):
    """`semantic_seg train --sparse-exec` routes eligible masked convs
    through the trainable fused block-sparse kernel (interpret mode on
    CPU) and completes an epoch with finite loss + a per-layer report."""
    save = str(tmp_path / "se")
    seg_main([
        "train", "--synthetic", "4", "-s", "32", "--batch-size", "2",
        "--epochs", "1", "--dtype", "float32", "--mesh-devices", "1",
        "--mc-pruning", "--pr-static", "--pr-config-path",
        os.path.join(
            VENDORED_CONFIGS, "drn_d_22", "drn_d_22_block128reg_87.50.json"
        ),
        "--sparse-exec", "--save-dir", save,
    ])
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    report = next(l["sparse_exec"] for l in lines if "sparse_exec" in l)
    n_sparse = sum(1 for v in report.values() if v.startswith("sparse-train"))
    assert n_sparse >= 8, report
    final = next(l for l in lines if "train_loss" in l)
    assert np.isfinite(final["train_loss"])
    assert os.path.exists(os.path.join(save, "checkpoint.npz"))


@pytest.mark.slow
def test_rmbsnn_sparse_exec_smoke(tmp_path, capsys):
    """`rmbsnn --sparse-exec` on a DRN classifier arch: eligible masked
    convs (cls naming) run through the trainable sparse kernel."""
    from tpuseg.cli.rmbsnn import main as rmbsnn_main

    cfg = {
        "pruner_type": "block_regular",
        "configs": [{
            "layer_set": ["layer6.0.conv1.weight", "layer7.0.weight"],
            "sparsity": 0.875, "block_height": 128, "block_width": 128,
        }],
    }
    cfg_path = tmp_path / "cls_block.json"
    cfg_path.write_text(json.dumps(cfg))
    rmbsnn_main([
        "--dataset", "synthetic", "--synthetic-n", "8", "-a", "drn_d_22",
        "-b", "4", "--epochs", "1", "--dtype", "float32",
        "--mc-pruning", "--pr-static", "--pr-config-path", str(cfg_path),
        "--sparse-exec", "--save-dir", str(tmp_path / "cls"),
        "--mesh-devices", "1",
    ])
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    report = next(l["sparse_exec"] for l in lines if "sparse_exec" in l)
    n_sparse = sum(1 for v in report.values() if v.startswith("sparse-train"))
    assert n_sparse == 2, report
