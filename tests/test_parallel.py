"""Multi-device tests on the 8-virtual-CPU-device mesh: data-parallel train
step, spatially-sharded forward, and equivalence with single-device runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.models import init_drnseg
from tpuseg.parallel import make_mesh, replicate, shard_batch, shard_train_step, spatial_forward
from tpuseg.models.drnseg import drnseg_forward
from tpuseg.train import create_train_state, make_seg_train_step, make_sgd


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "spatial": 1}
    mesh2 = make_mesh(data=4, spatial=2)
    assert mesh2.shape == {"data": 4, "spatial": 2}


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    tx = make_sgd(0.01, weight_decay=0.0)
    ts = create_train_state(params, state, tx)
    step = make_seg_train_step(spec, tx, compute_dtype=None)

    rng = np.random.default_rng(0)
    images = rng.random((8, 32, 32, 3), dtype=np.float32)
    labels = rng.integers(0, 19, size=(8, 32, 32))

    # single device
    ts1, m1 = jax.jit(step)(ts, jnp.asarray(images), jnp.asarray(labels))

    # 8-way data parallel
    mesh = make_mesh()
    ts_r = replicate(mesh, ts)
    img_s = shard_batch(mesh, jnp.asarray(images))
    lbl_s = shard_batch(mesh, jnp.asarray(labels))
    pstep = shard_train_step(step, mesh, donate_state=False)
    ts8, m8 = pstep(ts_r, img_s, lbl_s)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(ts1.params["seg.weight"]),
        np.asarray(ts8.params["seg.weight"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ts1.bn_state["layer.1.1.running_mean"]),
        np.asarray(ts8.bn_state["layer.1.1.running_mean"]),
        rtol=1e-5,
        atol=1e-7,
    )


@pytest.mark.slow
def test_spatial_sharded_forward_matches():
    """H-sharded inference (for >HBM activations) is numerically identical;
    XLA SPMD handles the conv halo exchanges."""
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    mesh = make_mesh(data=1, spatial=8)

    def fwd(p, s, x):
        logp, seg, _ = drnseg_forward(p, s, x, spec, train=False)
        return logp

    x = np.random.default_rng(1).random((1, 64, 64, 3), dtype=np.float32)
    ref = jax.jit(fwd)(params, state, jnp.asarray(x))

    p_r = replicate(mesh, {k: jnp.asarray(v) for k, v in params.items()})
    s_r = replicate(mesh, {k: jnp.asarray(v) for k, v in state.items()})
    sharded_fwd = spatial_forward(fwd, mesh)
    out = sharded_fwd(p_r, s_r, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_batch_stays_sharded_through_metrics():
    mesh = make_mesh()
    x = shard_batch(mesh, jnp.ones((16, 4)))
    assert x.sharding.spec == jax.sharding.PartitionSpec("data")


@pytest.mark.slow
def test_2d_mesh_train_step():
    """data x spatial 2-D mesh: batch sharded over 'data', H over 'spatial'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    tx = make_sgd(0.01, weight_decay=0.0)
    ts = create_train_state(params, state, tx)
    step = make_seg_train_step(spec, tx, compute_dtype=None)

    rng = np.random.default_rng(3)
    images = rng.random((4, 32, 32, 3), dtype=np.float32)
    labels = rng.integers(0, 19, size=(4, 32, 32))

    ts1, m1 = jax.jit(step)(ts, jnp.asarray(images), jnp.asarray(labels))

    mesh = make_mesh(data=4, spatial=2)
    ts_r = replicate(mesh, ts)
    img_s = jax.device_put(
        jnp.asarray(images), NamedSharding(mesh, P("data", "spatial"))
    )
    lbl_s = jax.device_put(
        jnp.asarray(labels), NamedSharding(mesh, P("data", "spatial"))
    )
    pstep = jax.jit(step, donate_argnums=())
    ts2, m2 = pstep(ts_r, img_s, lbl_s)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(ts1.params["seg.weight"]),
        np.asarray(ts2.params["seg.weight"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
