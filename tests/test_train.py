"""Train-step tests: loss definitions vs torch, optimizer parity with
torch.optim.SGD, masked training invariants, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from conftest import requires_reference

from tpuseg.models import build_drn_spec, init_drnseg
from tpuseg.models.drn import build_drn_spec as _bspec
from tpuseg.train import (
    TrainState,
    create_train_state,
    load_checkpoint,
    magnitude_unstructured_masks,
    make_eval_step,
    make_seg_train_step,
    make_sgd,
    milestones_for_epochs,
    multistep_schedule,
    save_checkpoint,
    sparsity_aware_reinit,
)
from tpuseg.train.checkpoint import restore_opt_state
from tpuseg.train.loss import cross_entropy_ignore, kd_loss, seg_loss_from_logprobs


def test_seg_loss_matches_torch_ce():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8))
    labels[0, :2] = 255  # ignored region

    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = float(seg_loss_from_logprobs(logp, jnp.asarray(labels)))

    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    # reference applies CE(ignore=255) to already-log-softmaxed outputs
    t_in = torch.nn.functional.log_softmax(t_logits, dim=1)
    ref = torch.nn.CrossEntropyLoss(ignore_index=255)(
        t_in, torch.from_numpy(labels).long()
    )
    assert ours == pytest.approx(float(ref), rel=1e-5)


def test_combined_kd_loss_includes_class_255():
    """Round-4 review: the KD hard term is a plain CE (the reference uses
    CrossEntropyLoss with no ignore index, rmbsnn_main.py:459-462) — on a
    >=256-class dataset, samples of class 255 must contribute, not be
    silently dropped by the segmentation ignore default."""
    torch = pytest.importorskip("torch")
    from tpuseg.train.loss import combined_kd_loss

    rng = np.random.default_rng(2)
    c = 300
    s = rng.normal(size=(6, c)).astype(np.float32)
    t = rng.normal(size=(6, c)).astype(np.float32)
    labels = np.array([255, 1, 255, 7, 299, 0])
    ours = float(combined_kd_loss(
        jnp.asarray(s), jnp.asarray(labels), jnp.asarray(t),
        student_wt=1.0, distill_wt=0.0))
    ref = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(s), torch.from_numpy(labels).long())
    assert ours == pytest.approx(float(ref), rel=1e-5)


def test_kd_loss_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    s = rng.normal(size=(4, 10)).astype(np.float32)
    t = rng.normal(size=(4, 10)).astype(np.float32)
    T = 4.0
    ours = float(kd_loss(jnp.asarray(s), jnp.asarray(t), T))
    st, tt = torch.from_numpy(s), torch.from_numpy(t)
    ref = F.kl_div(
        F.log_softmax(st / T, dim=1), F.softmax(tt / T, dim=1), reduction="sum"
    ) / s.shape[0]
    assert ours == pytest.approx(float(ref), rel=1e-4)


def test_sgd_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    lr, mom, wd = 0.1, 0.9, 1e-4

    # torch: 3 steps on a fixed quadratic-ish loss grad = w
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        (0.5 * (tw**2).sum()).backward()
        opt.step()

    tx = make_sgd(lr, momentum=mom, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        grads = {"w": params["w"]}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_multistep_schedule():
    sched = multistep_schedule(0.01, [2, 4], 0.1, steps_per_epoch=10)
    assert sched(0) == pytest.approx(0.01)
    assert sched(19) == pytest.approx(0.01)
    assert sched(20) == pytest.approx(0.001)
    assert sched(40) == pytest.approx(0.0001)
    assert milestones_for_epochs(200) == [40, 80, 120, 160]
    assert milestones_for_epochs(100, start_epoch=50) == [75, 100, 125]
    assert milestones_for_epochs(150, start_epoch=10) == [50, 90, 130]
    # only the 100/150 recipes rebase on resume (semantic_seg.py:992-1000)
    assert milestones_for_epochs(250, start_epoch=100) == [50, 100, 150, 200]


@pytest.mark.slow
def test_seg_train_step_masked():
    """One jitted step: loss finite, masked weights stay zero, up.weight frozen."""
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    masks = magnitude_unstructured_masks(params, 0.5, layers=["layer.6.0.conv1.weight"])
    tx = make_sgd(0.01)
    ts = create_train_state(params, state, tx, masks)
    step = jax.jit(make_seg_train_step(spec, tx, compute_dtype=None))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(2, 32, 32)))
    up_before = np.asarray(ts.params["up.weight"])

    ts2, metrics = step(ts, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.step) == 1
    # masked positions remain exactly zero after the update
    w = np.asarray(ts2.params["layer.6.0.conv1.weight"])
    m = np.asarray(masks["layer.6.0.conv1.weight"])
    assert np.all(w[m == 0] == 0)
    # frozen upsampler untouched
    np.testing.assert_array_equal(np.asarray(ts2.params["up.weight"]), up_before)
    # weights actually changed somewhere
    assert not np.allclose(
        np.asarray(ts2.params["seg.weight"]), np.asarray(ts.params["seg.weight"])
    )
    # BN running stats updated
    assert not np.allclose(
        np.asarray(ts2.bn_state["layer.1.1.running_mean"]),
        np.asarray(ts.bn_state["layer.1.1.running_mean"]),
    )


@pytest.mark.slow
def test_loss_decreases_over_steps():
    params, state, spec = init_drnseg(1, "drn_d_22", 19)
    tx = make_sgd(0.005, weight_decay=0.0)
    ts = create_train_state(params, state, tx)
    step = jax.jit(make_seg_train_step(spec, tx, compute_dtype=None))
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(2, 32, 32)))
    losses = []
    for _ in range(10):
        ts, m = step(ts, images, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    masks = magnitude_unstructured_masks(params, 0.5, layers=["layer.7.0.weight"])
    tx = make_sgd(0.01)
    ts = create_train_state(params, state, tx, masks)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        path,
        ts.params,
        ts.bn_state,
        opt_state=ts.opt_state,
        masks=ts.masks,
        meta={"epoch": 3, "arch": "drn_d_22", "best_miou": 61.5},
        is_best=True,
    )
    p2, s2, m2, opt_arrays, meta = load_checkpoint(path)
    assert meta["epoch"] == 3 and meta["best_miou"] == 61.5
    np.testing.assert_array_equal(
        np.asarray(ts.params["seg.weight"]), p2["seg.weight"]
    )
    assert set(m2) == {"layer.7.0.weight"}
    restored = restore_opt_state(tx.init(ts.params), opt_arrays)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal_shapes(restored, ts.opt_state)
    assert (tmp_path / "checkpoint_best.npz").exists()


def test_rejig_reinit():
    params, _, _ = init_drnseg(0, "drn_d_22", 19)
    layer = "layer.6.0.conv1.weight"
    masks = magnitude_unstructured_masks(params, 0.75, layers=[layer])
    rng = np.random.default_rng(0)
    out = sparsity_aware_reinit(params, masks, rng)
    w = out[layer]
    m = masks[layer]
    assert np.all(w[m == 0] == 0)
    kept = w[m == 1]
    # sparsity-corrected He std: n = nnz/IFM in OIHW view
    from tpuseg.sparsity.base import hwio_to_oihw

    nnz = int(m.sum())
    n = nnz // hwio_to_oihw(m).shape[1]
    assert kept.std() == pytest.approx(np.sqrt(2.0 / n), rel=0.1)
    # untouched layers are identical
    np.testing.assert_array_equal(out["seg.weight"], params["seg.weight"])


@pytest.mark.slow
def test_bf16_train_step_traces_and_runs():
    """Regression: bf16 compute once broke the conv VJP (mixed-dtype
    transpose conv with preferred_element_type) — only surfaced when
    training in bf16, which the TPU path always does."""
    params, state, spec = init_drnseg(2, "drn_d_22", 19)
    tx = make_sgd(0.01)
    ts = create_train_state(params, state, tx)
    step = jax.jit(make_seg_train_step(spec, tx, compute_dtype=jnp.bfloat16))
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(2, 32, 32)))
    ts2, m = step(ts, images, labels)
    assert np.isfinite(float(m["loss"]))
    # params stay f32 master copies
    assert ts2.params["seg.weight"].dtype == jnp.float32
