"""BN folding: folded inference forward must match the unfolded eval path."""

import numpy as np

import jax
import jax.numpy as jnp

from tpuseg.models import drnseg_forward, init_drnseg
from tpuseg.ops.fold_bn import fold_bn


def test_folded_forward_matches():
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    # non-trivial running stats so folding actually does something
    rng = np.random.default_rng(0)
    state = {
        k: (rng.random(v.shape).astype(np.float32) * 0.5 + 0.75
            if k.endswith("running_var")
            else rng.normal(size=v.shape).astype(np.float32) * 0.1)
        for k, v in state.items()
    }
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    ref_logp, ref_seg, _ = jax.jit(
        lambda p, s, v: drnseg_forward(p, s, v, spec, train=False)
    )(params, state, x)

    folded = fold_bn(params, state, spec)
    assert not any(".bn" in k or "downsample.1" in k or ".1.weight" in k
                   for k in folded if "layer.0" in k or "layer.1" in k), (
        "BN params should be gone from folded dict"
    )
    logp, seg, upd = jax.jit(
        lambda p, v: drnseg_forward(p, {}, v, spec, train=False)
    )(folded, x)
    assert not upd
    np.testing.assert_allclose(
        np.asarray(seg), np.asarray(ref_seg), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(ref_logp), rtol=2e-3, atol=2e-3
    )
