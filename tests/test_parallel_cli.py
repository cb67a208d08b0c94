"""CLI-level data-parallel tests.

The reference's multi-device story is DataParallel (semantic_seg.py:809-815)
and the DDP trainer (semantic_seg_multigpu.py:460-526), both untested in the
reference (SURVEY.md §4).  Here the trainer CLIs compile their step over a
jax.sharding.Mesh, and these tests pin the two correctness contracts:

- an 8-device mesh run produces the same params as the single-device run
  (the sharded-batch mean-loss gradient + XLA all-reduce == one big batch);
- two fake-host processes (jax.distributed over the gloo CPU backend) stay
  in lockstep: every replica ends with identical params.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from tpuseg.train import load_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train(tmp_path, mesh_devices):
    # one step (8 samples / batch 8): per-step equivalence at tight
    # tolerance; multi-step equivalence compounds CPU-conv reduction-order
    # round-off and is covered at the library level (test_parallel.py)
    from tpuseg.cli.semantic_seg import main as seg_main

    save = str(tmp_path / f"run_md{mesh_devices}")
    seg_main([
        "train", "--synthetic", "8", "-s", "32", "--batch-size", "8",
        "--epochs", "1", "--dtype", "float32", "--save-dir", save,
        "--mesh-devices", str(mesh_devices), "--eval-every", "1",
    ])
    return load_checkpoint(os.path.join(save, "checkpoint.npz"))


@pytest.mark.slow
def test_mesh_cli_matches_single_device(tmp_path):
    assert jax.device_count() == 8, "conftest should provide 8 CPU devices"
    p1, s1, _, _, _ = _train(tmp_path, 1)
    p8, s8, _, _, _ = _train(tmp_path, 8)
    assert p1.keys() == p8.keys()
    # CPU convs pick different algorithms for batch-1-per-device vs batch-8
    # shapes (oneDNN), so gradients differ by reduction-order round-off
    # (~1e-7) which SGD scales by ~lr*momentum into the ~1e-5 range after
    # one step; 1e-4 is an order of magnitude above that floor while still
    # catching any semantic divergence (a wrong mean/missing all-reduce is
    # O(1e-2) after one step)
    for k in p1:
        np.testing.assert_allclose(
            p8[k], p1[k], rtol=0, atol=1e-4,
            err_msg=f"param {k} diverged between 1- and 8-device runs",
        )
    for k in s1:
        np.testing.assert_allclose(s8[k], s1[k], rtol=0, atol=1e-4, err_msg=k)


@pytest.mark.slow
def test_two_process_replicas_lockstep(tmp_path):
    """Two fake hosts (1 CPU device each) train the same global batch; the
    replicated params on both processes must be identical after training —
    the contract DDP gets from NCCL all-reduce (rmbsnn_main.py:477-484)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    save = str(tmp_path / "mh")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["TPUSEG_PLATFORM"] = "cpu"
    env["TPUSEG_NUM_CPU_DEVICES"] = "1"
    env["TPUSEG_SAVE_ALL_PROCS"] = "1"
    base = [
        sys.executable, "-m", "tpuseg.cli.semantic_seg", "train",
        "--synthetic", "16", "-s", "32", "--batch-size", "4",
        "--epochs", "1", "--dtype", "float32", "--save-dir", save,
        "--eval-every", "1",
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
    ]
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(i)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:  # do not leak deadlocked children past the timeout
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{out[-3000:]}"
    p0, s0, _, _, _ = load_checkpoint(os.path.join(save, "replica_proc0.npz"))
    p1, s1, _, _, _ = load_checkpoint(os.path.join(save, "replica_proc1.npz"))
    assert p0.keys() == p1.keys()
    for k in p0:
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=f"replica divergence in {k}")
    for k in s0:
        np.testing.assert_array_equal(s0[k], s1[k], err_msg=k)
    # rank-0-only checkpoint, and it carries a finite val mIoU
    assert os.path.exists(os.path.join(save, "checkpoint.npz"))
    main_out = outs[0]
    line = [l for l in main_out.splitlines() if '"val_miou"' in l]
    assert line, f"no eval line in main-process output:\n{main_out[-2000:]}"
    assert np.isfinite(json.loads(line[-1])["val_miou"])


def test_coordinator_flag_requires_process_id():
    from tpuseg.cli.semantic_seg import main as seg_main

    with pytest.raises(SystemExit):
        seg_main([
            "train", "--synthetic", "4", "-s", "32",
            "--num-processes", "2", "--coordinator", "localhost:1234",
        ])
    with pytest.raises(SystemExit):
        seg_main(["train", "--synthetic", "4", "-s", "32", "--num-processes", "2"])


@pytest.mark.slow
def test_rmbsnn_mesh_runs(tmp_path):
    """Classifier trainer on the 8-device mesh (batch 128 → dp=8)."""
    from tpuseg.cli.rmbsnn import main as cls_main

    save = str(tmp_path / "cls")
    cls_main([
        "--dataset", "synthetic", "--synthetic-n", "64", "--batch-size", "32",
        "--epochs", "1", "--save-dir", save, "--arch", "cifar_resnet20",
    ])
    assert os.path.exists(os.path.join(save, "checkpoint.npz"))


@pytest.mark.slow
def test_two_process_eval_covers_full_val_set(tmp_path):
    """Multi-process --evaluate must cover the FULL val set: with 13 val
    samples over 2 processes the shards are unequal (7/6), and the old
    drop_last sharding silently dropped the tail — reported top-1/5 then
    differed from the single-process run on the same params (round-3
    advisor).  Shards now pad + mask around the allgather, so the two
    runs report identical accuracies."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["TPUSEG_PLATFORM"] = "cpu"
    env["TPUSEG_NUM_CPU_DEVICES"] = "1"
    base = [
        sys.executable, "-m", "tpuseg.cli.rmbsnn",
        "--dataset", "synthetic", "--synthetic-n", "13",
        "--batch-size", "4", "--arch", "cifar_resnet20", "--evaluate",
        "--save-dir", str(tmp_path / "eval"),
    ]

    def run(extra, environ):
        proc = subprocess.run(
            base + extra, env=environ, cwd=REPO, capture_output=True,
            text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines() if '"acc1"' in l]
        assert line, f"no eval line:\n{proc.stdout[-2000:]}"
        return json.loads(line[-1])

    single = run([], env)
    mp_env = dict(env)
    mh = [
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
    ]
    procs = [
        subprocess.Popen(
            base + mh + ["--process-id", str(i)], env=mp_env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{out[-3000:]}"
    line = [l for l in outs[0].splitlines() if '"acc1"' in l]
    assert line, f"no eval line in rank-0 output:\n{outs[0][-2000:]}"
    multi = json.loads(line[-1])
    assert multi["acc1"] == single["acc1"], (multi, single)
    assert multi["acc5"] == single["acc5"], (multi, single)


@pytest.mark.slow
def test_two_process_orbax_checkpoint(tmp_path):
    """--ckpt-format orbax under two processes: orbax's commit protocol
    runs cross-process barriers, so EVERY process must call save — a
    rank-0-only guard deadlocks rank 0 on a barrier the others never
    reach (regression: the CLIs guarded orbax saves with is_main)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    save = str(tmp_path / "mh_orbax")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["TPUSEG_PLATFORM"] = "cpu"
    env["TPUSEG_NUM_CPU_DEVICES"] = "1"
    base = [
        sys.executable, "-m", "tpuseg.cli.semantic_seg", "train",
        "--synthetic", "8", "-s", "32", "--batch-size", "4",
        "--epochs", "1", "--dtype", "float32", "--save-dir", save,
        "--eval-every", "1", "--ckpt-format", "orbax",
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
    ]
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(i)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    # a deadlocked save would hang here until the timeout
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:  # do not leak deadlocked children past the timeout
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{out[-3000:]}"
    from tpuseg.train import load_checkpoint

    params, state, _, _, meta = load_checkpoint(
        os.path.join(save, "checkpoint.orbax"))
    assert meta["epoch"] == 1
    assert all(np.all(np.isfinite(v)) for v in params.values())
