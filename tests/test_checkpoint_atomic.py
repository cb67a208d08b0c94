"""Crash-safety of checkpoint writes.

The reference torch.saves over the target path (semantic_seg.py:286-290), so
a preemption mid-save corrupts the checkpoint and the SLURM resubmit dies on
resume.  tpuseg writes to a temp file and os.replace()s it; SIGKILL at any
moment must leave a loadable checkpoint.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np

from tpuseg.train import load_checkpoint

WRITER = r"""
import sys
import numpy as np
from tpuseg.train import save_checkpoint

path = sys.argv[1]
# ~64MB of params so a save takes long enough to be killed mid-write
params = {f"layer{i}.weight": np.full((1024, 1024), float(i), np.float32)
          for i in range(16)}
bn = {"bn.mean": np.zeros(8, np.float32)}
i = 0
while True:
    i += 1
    save_checkpoint(path, params, bn, meta={"epoch": i})
    print(i, flush=True)
"""


import pytest


@pytest.mark.slow
def test_kill9_mid_save_leaves_loadable_checkpoint(tmp_path):
    path = str(tmp_path / "ckpt" / "checkpoint.npz")
    proc = subprocess.Popen(
        [sys.executable, "-c", WRITER, path],
        stdout=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        # wait until at least one full save has landed, then kill mid-loop
        first = proc.stdout.readline()
        assert first.strip(), "writer produced no output"
        time.sleep(0.05 + 0.1 * np.random.default_rng(0).random())
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert os.path.exists(path), "a completed save must persist"
    params, bn, _, _, meta = load_checkpoint(path)  # must not raise
    assert meta["epoch"] >= 1
    assert params["layer3.weight"].shape == (1024, 1024)
    np.testing.assert_array_equal(
        params["layer3.weight"], np.full((1024, 1024), 3.0, np.float32)
    )
    # a fresh save over any leftover temp file must succeed
    from tpuseg.train import save_checkpoint

    save_checkpoint(path, params, bn, meta={"epoch": meta["epoch"] + 1})
    assert load_checkpoint(path)[4]["epoch"] == meta["epoch"] + 1


def test_orbax_envelope_roundtrip(tmp_path):
    """BACKLOG #8: paths ending .orbax dispatch to the orbax envelope with
    the same tuple contract (async save + overwrite + best-copy)."""
    from tpuseg.train import save_checkpoint
    from tpuseg.train.orbax_ckpt import wait_for_saves

    path = str(tmp_path / "run" / "checkpoint.orbax")
    params = {"conv1.weight": np.full((3, 3, 4, 8), 1.5, np.float32)}
    bn = {"bn1.mean": np.zeros(8, np.float32)}
    masks = {"conv1.weight": np.ones((3, 3, 4, 8), np.float32)}
    opt = [{"mu": {"conv1.weight": np.full((3, 3, 4, 8), 2.0, np.float32)}}]
    save_checkpoint(path, params, bn, opt_state=opt, masks=masks,
                    meta={"epoch": 1, "arch": "drn_d_22"}, is_best=True)
    p, s, m, oa, meta = load_checkpoint(path)
    np.testing.assert_array_equal(p["conv1.weight"], params["conv1.weight"])
    np.testing.assert_array_equal(m["conv1.weight"], masks["conv1.weight"])
    np.testing.assert_array_equal(
        oa["0/mu/conv1.weight"], opt[0]["mu"]["conv1.weight"]
    )
    assert meta == {"epoch": 1, "arch": "drn_d_22"}
    # best-copy directory mirrors checkpoint_best.npz
    best = load_checkpoint(str(tmp_path / "run" / "checkpoint_best.orbax"))
    assert best[4]["epoch"] == 1
    # async save overwrites the existing directory atomically
    save_checkpoint(path, params, bn, meta={"epoch": 2}, async_save=True)
    # CRASH-SAFETY (round-3 advisor, medium): while the async save is in
    # flight — the whole background-write window — the previous checkpoint
    # must remain intact AND loadable at its final path.  The new save
    # lands in <path>.new and is only swapped over after commit.
    assert load_checkpoint(path)[4]["epoch"] == 1
    wait_for_saves()
    assert load_checkpoint(path)[4]["epoch"] == 2
    assert not os.path.exists(path + ".new"), "swap must consume the sibling"


def test_orbax_load_falls_back_to_committed_sibling(tmp_path):
    """A crash between the swap renames can leave the new save committed at
    <path>.new with <path> absent; load must pick it up."""
    from tpuseg.train import save_checkpoint

    final = str(tmp_path / "checkpoint.orbax")
    params = {"w": np.full((4,), 7.0, np.float32)}
    save_checkpoint(final, params, {}, meta={"epoch": 9})
    os.rename(final, final + ".new")  # simulate crash mid-swap
    p, _, _, _, meta = load_checkpoint(final)
    assert meta["epoch"] == 9
    np.testing.assert_array_equal(p["w"], params["w"])


def test_orbax_committed_new_beats_stale_final(tmp_path):
    """Round-4 review: an async save that COMMITTED to <path>.new but
    crashed before the swap is the newest durable checkpoint.  Load must
    prefer it over the older <path>, and the next save must rescue (swap)
    it rather than rmtree it as a stale sibling."""
    from tpuseg.train import save_checkpoint

    final = str(tmp_path / "checkpoint.orbax")
    save_checkpoint(final, {"w": np.full((4,), 1.0, np.float32)}, {},
                    meta={"epoch": 1})
    # fabricate the crash window: epoch-2 save committed at .new, swap lost
    # (stage under a .orbax name so it dispatches to the orbax envelope)
    stage = str(tmp_path / "stage" / "checkpoint.orbax")
    save_checkpoint(stage, {"w": np.full((4,), 2.0, np.float32)},
                    {}, meta={"epoch": 2})
    os.rename(stage, final + ".new")
    assert load_checkpoint(final)[4]["epoch"] == 2, \
        "committed .new must win over the older final path"
    # the next save must fold the rescued epoch-2 in (not delete it) before
    # landing epoch 3
    save_checkpoint(final, {"w": np.full((4,), 3.0, np.float32)}, {},
                    meta={"epoch": 3})
    assert load_checkpoint(final)[4]["epoch"] == 3
    assert not os.path.exists(final + ".new")


def test_orbax_uncommitted_new_is_cleaned(tmp_path):
    """An UNCOMMITTED .new sibling (crash mid-write) must be removed so the
    next save succeeds, and load must ignore it in favor of <path>."""
    from tpuseg.train import save_checkpoint

    final = str(tmp_path / "checkpoint.orbax")
    save_checkpoint(final, {"w": np.full((4,), 1.0, np.float32)}, {},
                    meta={"epoch": 1})
    os.makedirs(final + ".new")  # empty dir: never committed by orbax
    assert load_checkpoint(final)[4]["epoch"] == 1
    save_checkpoint(final, {"w": np.full((4,), 2.0, np.float32)}, {},
                    meta={"epoch": 2})
    assert load_checkpoint(final)[4]["epoch"] == 2
    assert not os.path.exists(final + ".new")
