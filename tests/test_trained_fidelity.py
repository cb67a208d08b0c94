"""trained_fidelity tool mechanics (tiny settings — the real run is
`python -m tpuseg.tools.trained_fidelity`, see runs/fidelity)."""

import json
import os

import pytest


@pytest.mark.slow
def test_all_stages_smoke(tmp_path):
    """Every stage runs end-to-end at smoke scale and appends its report
    entry; re-running a stage REPLACES its entry (idempotent reports)."""
    from tpuseg.tools.trained_fidelity import main

    out = str(tmp_path / "fid")
    args = ["--out", out, "--train-size", "32", "--batch", "2",
            "--steps", "2", "--recover-steps", "2", "--cls-steps", "2",
            "--eval-every", "2", "--target-miou", "200",
            "--video-frames", "4", "--serve-batch", "2"]
    main(["--stage", "train"] + args)
    # int8 modes are backend-gated off on CPU (naive int8 conv lowering);
    # force one through --modes to cover the filter AND the int8 path at
    # this tiny size, then a second partial run must MERGE into the matrix
    main(["--stage", "fidelity", "--modes", "yuv420,temporal2"] + args)
    main(["--stage", "fidelity", "--modes", "budget,int8_dynamic"] + args)
    main(["--stage", "compress"] + args)
    main(["--stage", "compose", "--modes", "sparse_budget"] + args)
    main(["--stage", "budget_curve", "--budget-ks", "1,2",
          "--speeds", "2.0"] + args)
    with open(os.path.join(out, "report.json")) as fh:
        rows = json.load(fh)
    stages = [r["stage"] for r in rows]
    assert stages == ["train", "fidelity", "compress", "compose",
                      "budget_curve"]
    curve = rows[4]["curves"]["speed=2.0"]["points"]
    assert set(curve) == {"exact", "K=1", "K=2"}
    assert curve["K=1"]["max_refresh_fraction"] == 0.5  # serve_batch=2
    assert 0 <= curve["K=1"]["gt_miou"] <= 100
    fid = rows[1]
    assert fid["modes"]["exact"]["ids_agreement_vs_exact"] == 1.0
    assert {"yuv420", "temporal2", "budget", "int8_dynamic"} <= set(
        fid["modes"])  # partial runs merged
    assert 0 <= rows[2]["rbgp_50"]["miou_at_mask"] <= 100
    comp = rows[3]["modes"]
    # the two baselines always run; sparse_exact is its own agreement ref
    assert {"sparse_exact", "dense_exact", "sparse_budget"} == set(comp)
    assert comp["sparse_exact"]["ids_agreement_vs_sparse_exact"] == 1.0
    assert 0 <= comp["dense_exact"]["gt_miou"] <= 100
    # recovered checkpoint is cached: re-running compose must NOT retrain
    ck = os.path.join(out, "drn_d_22_shapes_block128reg.npz")
    assert os.path.exists(ck)
    mtime = os.path.getmtime(ck)
    main(["--stage", "compose", "--modes", "sparse_budget"] + args)
    assert os.path.getmtime(ck) == mtime
    # idempotent replace
    main(["--stage", "train"] + args)
    with open(os.path.join(out, "report.json")) as fh:
        rows2 = json.load(fh)
    assert [r["stage"] for r in rows2].count("train") == 1


def test_fidelity_requires_checkpoint(tmp_path):
    from tpuseg.tools.trained_fidelity import main

    with pytest.raises(SystemExit):
        main(["--stage", "fidelity", "--out", str(tmp_path / "empty")])
