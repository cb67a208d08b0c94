"""RMCDB roll+compact lowering (tpuseg.ops.rmcdb_lowering): structure
detection on real masker output and exactness vs the masked dense matmul."""

import numpy as np

import jax.numpy as jnp

from tpuseg.ops.rmcdb_lowering import detect_rmcdb_rolls, rmcdb_roll_matmul
from tpuseg.sparsity.rmcdb import BlockletType, RmcdbConfig, prune_as_rmcdb


def _case(rng, rows=256, cols=256, bh=64, bw=64, b=8, count=2, spo=0.0):
    w = rng.normal(size=(rows, cols)).astype(np.float32)
    cfg = RmcdbConfig(
        bh=bh, bw=bw, spo=spo,
        bl_types=[BlockletType(b, b)], bl_counts=[count],
    )
    mask, _ = prune_as_rmcdb(w, cfg)
    return w, mask.astype(np.float32)


def test_detect_and_exact():
    rng = np.random.default_rng(0)
    w, mask = _case(rng)
    plan = detect_rmcdb_rolls(w, mask, 64, 64, 8, dtype=jnp.float32)
    assert plan is not None
    assert 0 < plan.density < 0.5  # count=2 of 8 diagonals = 25%
    x = rng.normal(size=(32, 256)).astype(np.float32)
    y_ref = x @ (w * mask).T
    y = np.asarray(rmcdb_roll_matmul(jnp.asarray(x), plan))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_detect_with_outer_sparsity_and_multi_blocklet():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(128, 256)).astype(np.float32)
    cfg = RmcdbConfig(
        bh=32, bw=32, spo=0.5,
        bl_types=[BlockletType(4, 4)], bl_counts=[3],
    )
    mask, _ = prune_as_rmcdb(w, cfg)
    plan = detect_rmcdb_rolls(w, mask.astype(np.float32), 32, 32, 4,
                              dtype=jnp.float32)
    assert plan is not None
    x = rng.normal(size=(16, 256)).astype(np.float32)
    y_ref = x @ (w * mask).T
    y = np.asarray(rmcdb_roll_matmul(jnp.asarray(x), plan))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_detect_rejects_partial_diagonal():
    """A mask whose live blocklets do not form FULL cyclic diagonals (e.g.
    one blocklet knocked out) is not representable and must return None.
    (A fully-random blocklet-dense mask, by contrast, IS a valid union of
    all diagonals — detection would return an exact all-offsets plan.)"""
    rng = np.random.default_rng(2)
    w, mask = _case(rng, rows=128, cols=128, bh=32, bw=32, b=4, count=2)
    live = np.argwhere(mask != 0)
    r0, c0 = live[0]
    # zero the whole 4x4 blocklet containing the first live entry
    mask[(r0 // 4) * 4 : (r0 // 4 + 1) * 4,
         (c0 // 4) * 4 : (c0 // 4 + 1) * 4] = 0.0
    assert detect_rmcdb_rolls(w, mask, 32, 32, 4) is None


def test_detect_rejects_wrong_geometry():
    rng = np.random.default_rng(3)
    w, mask = _case(rng)
    assert detect_rmcdb_rolls(w, mask, 48, 64, 8) is None  # rows % bh
