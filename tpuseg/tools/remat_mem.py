"""Compiler-reported HBM for ``--remat`` vs non-remat train steps.

The axon relay exposes no runtime ``memory_stats()`` (returns None), so
the honest memory number for rematerialization is the XLA compiler's own
buffer assignment: ``jit(step).lower(...).compile().memory_analysis()``
reports the temp (activation/workspace) bytes the executable reserves.
That is exactly the quantity remat trades FLOPs against — the live
activation set between forward and backward.

Prints one JSON line per (case, remat) pair plus a ratio line per case:

    python -m tpuseg.tools.remat_mem [--cases seg,cls,kd]

Cases (shapes chosen to mirror the documented workloads):
  seg — DRN-D-22 semantic-seg train step, 768x768 crop, batch 4
        (the reference trains 896x896 crops on 8 GPUs' aggregate memory,
        semantic_seg.py:809-815; remat is the one-chip answer)
  cls — cifar_resnet56 classifier train step, batch 1024
  kd  — cifar_resnet20 student + cifar_resnet56 teacher KD step,
        batch 1024 (rmbsnn --remat; the teacher saves no activations
        either way — only the student forward is checkpointed)
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def _analyze(step_fn, *abstract_args):
    compiled = jax.jit(step_fn).lower(*abstract_args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    return {
        "temp_mb": round(ma.temp_size_in_bytes / 2**20, 2),
        "arg_mb": round(ma.argument_size_in_bytes / 2**20, 2),
        "out_mb": round(ma.output_size_in_bytes / 2**20, 2),
        "alias_mb": round(ma.alias_size_in_bytes / 2**20, 2),
    }


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def _report(case, make_step, ts, batch_args):
    rows = {}
    for remat in (False, True):
        step = make_step(remat)
        mem = _analyze(step, _abstract(ts), *map(_abstract, batch_args))
        rows[remat] = mem
        print(json.dumps({"case": case, "remat": remat, **(mem or {})}))
    if rows[False] and rows[True] and rows[False]["temp_mb"]:
        print(json.dumps({
            "case": case,
            "temp_ratio": round(
                rows[True]["temp_mb"] / rows[False]["temp_mb"], 3),
        }))


def run_seg():
    from tpuseg.models import init_drnseg
    from tpuseg.train import create_train_state, make_seg_train_step, make_sgd

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    tx = make_sgd(0.01)
    ts = create_train_state(params, state, tx)
    images = np.zeros((4, 768, 768, 3), np.float32)
    labels = np.zeros((4, 768, 768), np.int32)
    _report(
        "seg_drn_d_22_768x768_b4",
        lambda remat: make_seg_train_step(
            spec, tx, compute_dtype=jnp.bfloat16, remat=remat),
        ts, (images, labels),
    )


def run_cls():
    from tpuseg.models.cifar import create_cifar_model
    from tpuseg.train import create_train_state, make_cls_train_step, make_sgd

    params, state, spec = create_cifar_model(0, "cifar_resnet56", 10)
    tx = make_sgd(0.1)
    ts = create_train_state(params, state, tx)
    images = np.zeros((1024, 32, 32, 3), np.float32)
    labels = np.zeros((1024,), np.int32)
    _report(
        "cls_resnet56_b1024",
        lambda remat: make_cls_train_step(
            spec, tx, compute_dtype=jnp.bfloat16, remat=remat),
        ts, (images, labels),
    )


def run_kd():
    from tpuseg.models.cifar import create_cifar_model
    from tpuseg.train import create_train_state, make_cls_train_step, make_sgd
    from tpuseg.train.trainer import classifier_forward

    params, state, spec = create_cifar_model(0, "cifar_resnet20", 10)
    t_params, t_state, t_spec = create_cifar_model(1, "cifar_resnet56", 10)
    t_fwd = classifier_forward(t_spec, jnp.bfloat16)
    teacher = (
        lambda p, s, x: t_fwd(p, s, x, train=False)[0], t_params, t_state)
    tx = make_sgd(0.1)
    ts = create_train_state(params, state, tx)
    images = np.zeros((1024, 32, 32, 3), np.float32)
    labels = np.zeros((1024,), np.int32)
    _report(
        "kd_resnet20_from_56_b1024",
        lambda remat: make_cls_train_step(
            spec, tx, compute_dtype=jnp.bfloat16, teacher=teacher,
            remat=remat),
        ts, (images, labels),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cases", default="seg,cls,kd")
    args = p.parse_args(argv)
    for case in args.cases.split(","):
        {"seg": run_seg, "cls": run_cls, "kd": run_kd}[case.strip()]()


if __name__ == "__main__":
    main()
