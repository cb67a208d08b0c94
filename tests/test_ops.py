"""Op-level tests: phase-decomposed upsample vs the transposed-conv ground
truth, fused argmax correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.models.drnseg import bilinear_upsample_kernel, upsample8
from tpuseg.ops.upsample import upsample8_phase, upsample_argmax


def test_phase_upsample_matches_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 7, 9, 5)).astype(np.float32))
    k = jnp.asarray(bilinear_upsample_kernel())
    ref = upsample8(x, k)
    out = upsample8_phase(x, k)
    assert out.shape == ref.shape == (2, 56, 72, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_phase_upsample_asymmetric_kernel():
    """Phase weights must be exact for non-symmetric separable kernels too
    (the conv formulation flips the kernel; the index map must match)."""
    rng = np.random.default_rng(7)
    f1 = rng.random(16).astype(np.float32) + 0.1  # positive, asymmetric
    k2 = jnp.asarray(np.outer(f1, f1))
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 2)).astype(np.float32))
    ref = upsample8(x, k2)
    out = upsample8_phase(x, k2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_upsample_argmax_matches_naive():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 19)).astype(np.float32))
    k = jnp.asarray(bilinear_upsample_kernel())
    naive = jnp.argmax(upsample8(x, k), axis=-1)
    fused = upsample_argmax(x, k)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(naive))


def test_upsample_argmax_jits():
    k = jnp.asarray(bilinear_upsample_kernel())
    f = jax.jit(lambda s: upsample_argmax(s, k))
    ids = f(jnp.zeros((1, 4, 4, 3)))
    assert ids.shape == (1, 32, 32)
    assert ids.dtype == jnp.int32


@pytest.mark.slow
def test_upsample_argmax_pallas_matches(monkeypatch):
    import tpuseg.ops.upsample as up_mod
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        return orig(*a, **{**kw, "interpret": True})

    monkeypatch.setattr("jax.experimental.pallas.pallas_call", interp)

    from tpuseg.ops.upsample import upsample_argmax, upsample_argmax_pallas

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 19)).astype(np.float32))
    k = jnp.asarray(bilinear_upsample_kernel())
    ref = upsample_argmax(x, k)
    out = upsample_argmax_pallas(x, k)
    assert out.shape == (2, 48, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # ASYMMETRIC kernel too (round-4 review: the Pallas path skipped the
    # transposed-conv tap flip, which only coincides for symmetric kernels)
    f1 = rng.random(16).astype(np.float32) + 0.1
    k_asym = jnp.asarray(np.outer(f1, f1))
    ref_a = upsample_argmax(x, k_asym)
    out_a = upsample_argmax_pallas(x, k_asym)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(ref_a))
