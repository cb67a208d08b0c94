"""Pallas BSR matmul tests (interpret mode on CPU; the real-TPU run is
exercised by the kernel benchmark)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tpuseg.ops.bsr as bsr_mod
from tpuseg.ops.bsr import BsrWeights, bsr_matmul, pack_bsr


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run pallas in interpreter mode on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        bsr_mod.pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )


def _random_block_mask(rng, nrb, ncb, bm, bk, density):
    coarse = (rng.random((nrb, ncb)) < density).astype(np.float32)
    # ensure at least one block per row to exercise both paths
    for i in range(nrb):
        if coarse[i].sum() == 0:
            coarse[i, rng.integers(0, ncb)] = 1
    return np.kron(coarse, np.ones((bm, bk), np.float32))


@pytest.mark.parametrize("density", [0.25, 0.5, 1.0])
def test_bsr_matches_masked_dense(density):
    rng = np.random.default_rng(0)
    bm = bk = 128
    M, K, N = 256, 512, 256
    w = rng.normal(size=(M, K)).astype(np.float32)
    mask = _random_block_mask(rng, M // bm, K // bk, bm, bk, density)
    packed = pack_bsr(w, mask, bm, bk, dtype=jnp.float32)
    x = rng.normal(size=(K, N)).astype(np.float32)
    y = bsr_matmul(packed, jnp.asarray(x), bn=128)
    ref = (w * mask) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    assert packed.block_density == pytest.approx(
        mask.reshape(M // bm, bm, K // bk, bk).any(axis=(1, 3)).mean()
    )


def test_bsr_ragged_rows():
    """Rows with different nonzero-block counts (padding path)."""
    rng = np.random.default_rng(1)
    bm = bk = 128
    M, K, N = 384, 384, 128
    coarse = np.array(
        [[1, 0, 0], [1, 1, 1], [0, 1, 0]], dtype=np.float32
    )
    mask = np.kron(coarse, np.ones((bm, bk), np.float32))
    w = rng.normal(size=(M, K)).astype(np.float32)
    packed = pack_bsr(w, mask, bm, bk, dtype=jnp.float32)
    assert packed.rowptr.tolist() == [0, 1, 4, 5]
    x = rng.normal(size=(K, N)).astype(np.float32)
    y = bsr_matmul(packed, jnp.asarray(x), bn=128)
    np.testing.assert_allclose(np.asarray(y), (w * mask) @ x, rtol=1e-4, atol=1e-4)


def test_pack_bsr_from_block_masker():
    """A BlockPruner mask with MXU-sized blocks packs losslessly."""
    from tpuseg.sparsity.block import BlockConfig, prune_as_block

    rng = np.random.default_rng(2)
    w = rng.normal(size=(256, 512)).astype(np.float32)
    mask = prune_as_block(w, BlockConfig(0.75, 128, 128, -1, -1, True))
    packed = pack_bsr(w, mask, 128, 128, dtype=jnp.float32)
    assert packed.block_density == pytest.approx(0.25, abs=0.13)
    x = rng.normal(size=(512, 128)).astype(np.float32)
    y = bsr_matmul(packed, jnp.asarray(x), bn=128)
    np.testing.assert_allclose(np.asarray(y), (w * mask) @ x, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("density", [0.25, 0.5])
def test_bsr_gathered_matches_masked_dense(density):
    from tpuseg.ops.bsr import bsr_matmul_gathered

    rng = np.random.default_rng(3)
    bm = bk = 128
    M, K, N = 256, 512, 256
    w = rng.normal(size=(M, K)).astype(np.float32)
    mask = _random_block_mask(rng, M // bm, K // bk, bm, bk, density)
    packed = pack_bsr(w, mask, bm, bk, dtype=jnp.float32)
    x = rng.normal(size=(K, N)).astype(np.float32)
    y = bsr_matmul_gathered(packed, jnp.asarray(x), bn=128)
    np.testing.assert_allclose(np.asarray(y), (w * mask) @ x, rtol=1e-4, atol=1e-4)
