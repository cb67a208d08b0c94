"""Native C++ sparsity library: exact parity with the numpy implementations."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tpuseg import native
from tpuseg.sparsity.block import BlockConfig, block_abs_sums, prune_as_block
from tpuseg.sparsity.rmb import BlockletType, RmbConfig, prune_as_rmb


@pytest.fixture(scope="module", autouse=True)
def _built():
    if not native.available():
        subprocess.run(
            [sys.executable, "-m", "tpuseg.native_build"], check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        native._CACHE.clear()
    assert native.available(), "native library failed to build"


def test_block_abs_sums_parity():
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(64, 96)).astype(np.float32)
    ours = native.block_abs_sums(mat, 8, 16)
    ref = block_abs_sums(mat, 8, 16)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_block_abs_sums_ragged():
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(30, 50)).astype(np.float32)
    np.testing.assert_allclose(
        native.block_abs_sums(mat, 8, 16), block_abs_sums(mat, 8, 16), rtol=1e-6
    )


@pytest.mark.parametrize("bh,bw,sp", [(2, 2, 0.5), (1, 1, 0.75), (4, 8, 0.25)])
def test_prune_block_mask_parity(bh, bw, sp):
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(32, 64)).astype(np.float32)
    ours = native.prune_block_mask(mat, bh, bw, sp)
    ref = prune_as_block(
        mat.astype(np.float64), BlockConfig(sp, bh, bw, -1, -1, True)
    )
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_rmb_prune_parity():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(16, 16)).astype(np.float32)
    cfg = RmbConfig(8, 8, 0.5, [BlockletType(2, 2), BlockletType(1, 1)], [1, 2])
    ref, _ = prune_as_rmb(mat.astype(np.float64), cfg)
    ours = native.rmb_prune(mat, 8, 8, 0.5, cfg.bl_types, cfg.bl_counts)
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_bsr_pack_parity():
    from tpuseg.ops.bsr import pack_bsr
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    w = rng.normal(size=(256, 512)).astype(np.float32)
    coarse = (rng.random((2, 4)) < 0.5).astype(np.float32)
    coarse[0, 0] = 1
    mask = np.kron(coarse, np.ones((128, 128), np.float32))
    vals, rowptr, colidx = native.bsr_pack(w * mask, 128, 128)
    ref = pack_bsr(w, mask, 128, 128, dtype=jnp.float32)
    np.testing.assert_array_equal(rowptr, ref.rowptr)
    np.testing.assert_array_equal(colidx, ref.colidx)
    np.testing.assert_allclose(vals, np.asarray(ref.vals), rtol=1e-6)


def test_native_speedup_large_layer():
    """The point of the native path: big-layer mask generation is fast."""
    import time

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(512, 4608)).astype(np.float32)
    cfg = RmbConfig(64, 64, 0.5, [BlockletType(2, 2)], [8])
    t0 = time.perf_counter()
    ours = native.rmb_prune(mat, 64, 64, 0.5, cfg.bl_types, cfg.bl_counts)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref, _ = prune_as_rmb(mat.astype(np.float64), cfg)
    t_py = time.perf_counter() - t0
    np.testing.assert_array_equal(ours, ref.astype(np.float32))
    assert t_native < t_py, (t_native, t_py)
