"""Per-stage rematerialization (jax.checkpoint) of the DRN backbone.

``remat=True`` must be a pure memory/FLOPs trade: gradients, BN updates,
and whole train steps are EXACTLY the values of the non-remat path (the
recomputed forward replays the same ops on the same inputs).  Bitwise
equality holds on this CPU test path; on the TPU chip the bf16 recompute
fuses differently and losses differ at rounding level (measured
8.006001 vs 8.006046 — see PERF_NOTES).  There is no
reference counterpart — torch's analogous lever is
``torch.utils.checkpoint`` which the reference never uses; this is the
TPU-native capability that lets the 1024x2048 crops the reference feeds
multi-GPU DataParallel (semantic_seg.py:809-815) train on one chip's HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import init_drnseg
from tpuseg.models.drnseg import drnseg_forward
from tpuseg.train import create_train_state, make_seg_train_step, make_sgd


def _batch(seed=0, n=2, hw=32):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.random((n, hw, hw, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(n, hw, hw)))
    return images, labels


def test_remat_grads_exact():
    """value_and_grad through the remat forward == non-remat, bitwise."""
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    images, labels = _batch()

    def loss(params, remat):
        logp, _seg, updates = drnseg_forward(
            params, state, images, spec, train=True, remat=remat
        )
        onehot = jax.nn.one_hot(labels, 19, dtype=logp.dtype)
        return -(onehot * logp).mean(), updates

    (v0, upd0), g0 = jax.jit(
        jax.value_and_grad(loss, has_aux=True), static_argnums=1
    )(params, False)
    (v1, upd1), g1 = jax.jit(
        jax.value_and_grad(loss, has_aux=True), static_argnums=1
    )(params, True)

    assert np.asarray(v0) == np.asarray(v1)
    assert set(g0) == set(g1)
    for k in g0:
        np.testing.assert_array_equal(
            np.asarray(g0[k]), np.asarray(g1[k]), err_msg=k
        )
    assert set(upd0) == set(upd1)
    for k in upd0:
        np.testing.assert_array_equal(np.asarray(upd0[k]), np.asarray(upd1[k]))


def test_remat_train_step_exact():
    """A full jitted train step under remat reproduces params/bn/loss."""
    params, state, spec = init_drnseg(1, "drn_d_22", 19)
    tx = make_sgd(0.01)
    images, labels = _batch(seed=1)

    outs = {}
    for remat in (False, True):
        ts = create_train_state(params, state, tx)
        step = jax.jit(make_seg_train_step(spec, tx, compute_dtype=None,
                                           remat=remat))
        ts2, metrics = step(ts, images, labels)
        outs[remat] = (ts2, float(metrics["loss"]))

    (a, la), (b, lb) = outs[False], outs[True]
    assert la == lb and np.isfinite(la)
    for k in a.params:
        np.testing.assert_array_equal(
            np.asarray(a.params[k]), np.asarray(b.params[k]), err_msg=k
        )
    for k in a.bn_state:
        np.testing.assert_array_equal(
            np.asarray(a.bn_state[k]), np.asarray(b.bn_state[k]), err_msg=k
        )


# ---------------------------------------------------------------------------
# classifier arm (cifar zoo + KD): stage-GROUP remat, same exactness contract
# ---------------------------------------------------------------------------

import pytest

from tpuseg.models.cifar import create_cifar_model
from tpuseg.train import make_cls_train_step
from tpuseg.train.trainer import classifier_forward


def _cls_batch(seed=0, n=2, classes=10):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.random((n, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, classes, size=(n,)))
    return images, labels


@pytest.mark.parametrize(
    "arch,bitwise",
    [
        ("cifar_resnet20", True),
        ("cifar_resnet18", True),
        ("cifar_vgg11_bn", True),
        # groups that START with a BatchNorm on the group input (preact,
        # wrn wide_basic): the stem params' gradients flow through the
        # recomputed BN backward, which XLA schedules differently —
        # measured ~2e-9 absolute on the stem bias after one step (pure
        # f32 rounding, loss itself still bitwise).  Conv-led groups
        # above are bitwise end-to-end.
        ("cifar_preact_resnet20", False),
        ("cifar_wrn_16_4", False),
    ],
)
def test_cls_remat_train_step_exact(arch, bitwise):
    """One jitted classifier train step under remat == non-remat for one
    arch of every forward family (cresnet, preact, tvresnet, vgg, wrn)."""
    params, state, spec = create_cifar_model(0, arch, 10)
    tx = make_sgd(0.05)
    images, labels = _cls_batch()

    outs = {}
    for remat in (False, True):
        ts = create_train_state(params, state, tx)
        step = jax.jit(make_cls_train_step(spec, tx, compute_dtype=None,
                                           remat=remat))
        ts2, metrics = step(ts, images, labels)
        outs[remat] = (ts2, float(metrics["loss"]))

    (a, la), (b, lb) = outs[False], outs[True]
    assert la == lb and np.isfinite(la)
    for k in a.params:
        if bitwise:
            np.testing.assert_array_equal(
                np.asarray(a.params[k]), np.asarray(b.params[k]), err_msg=k
            )
        else:
            np.testing.assert_allclose(
                np.asarray(a.params[k]), np.asarray(b.params[k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )
    assert set(a.bn_state) == set(b.bn_state)
    for k in a.bn_state:
        np.testing.assert_allclose(
            np.asarray(a.bn_state[k]), np.asarray(b.bn_state[k]),
            rtol=1e-6, atol=0, err_msg=k,
        )


def test_cls_remat_with_kd_exact():
    """Remat composes with knowledge distillation (teacher stop-gradient)."""
    params, state, spec = create_cifar_model(0, "cifar_resnet20", 10)
    t_params, t_state, t_spec = create_cifar_model(1, "cifar_resnet32", 10)
    t_fwd_full = classifier_forward(t_spec, None)
    teacher = (
        lambda p, s, x: t_fwd_full(p, s, x, train=False)[0],
        t_params, t_state,
    )
    tx = make_sgd(0.05)
    images, labels = _cls_batch(seed=3)

    outs = {}
    for remat in (False, True):
        ts = create_train_state(params, state, tx)
        step = jax.jit(make_cls_train_step(
            spec, tx, compute_dtype=None, teacher=teacher, remat=remat))
        ts2, metrics = step(ts, images, labels)
        outs[remat] = (ts2, float(metrics["loss"]))

    (a, la), (b, lb) = outs[False], outs[True]
    assert la == lb and np.isfinite(la)
    for k in a.params:
        np.testing.assert_array_equal(
            np.asarray(a.params[k]), np.asarray(b.params[k]), err_msg=k
        )
