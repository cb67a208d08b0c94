"""Classification trainer with pruning + knowledge distillation.

Parity with /root/reference/rmbsnn_main.py: base-model load, optional
teacher + KD (temperature-softened KL mixed with CE, :459-469), pruner
dispatch (:246-271), static rejig re-init (:360-385), per-step mask re-apply
(:483-484), top-1/5 validation, rank-0 checkpointing, step LR decay
(adjust_learning_rate :600-639).

TPU-native: one jitted train step compiled over a data-parallel
``jax.sharding.Mesh`` (all local devices; all global devices under
--num-processes, replacing mp.spawn + DDP/NCCL — rmbsnn_main.py:143-152,
162-238 — with XLA collectives over ICI/DCN).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from os.path import join

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tpuseg pruned-classifier trainer")
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "cifar100", "mnist", "imagenet", "synthetic"])
    p.add_argument("--data", default=None, help="dataset root dir")
    p.add_argument("-a", "--arch", default="cifar_resnet20")
    p.add_argument("-b", "--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", "--weight-decay", dest="weight_decay",
                   type=float, default=1e-4)
    p.add_argument("--base-model", default=None, help="dense weights to start from")
    p.add_argument("--teacher-model", default=None, help="KD teacher checkpoint")
    p.add_argument("--teacher-arch", default=None)
    p.add_argument("--kd-student-wt", type=float, default=0.5)
    p.add_argument("--kd-distill-wt", type=float, default=0.5)
    p.add_argument("--kd-temperature", type=float, default=4.0)
    # pruning (reference flags)
    p.add_argument("--mc-pruning", action="store_true")
    p.add_argument("--pr-config-path", default=None)
    p.add_argument("--pr-static", action="store_true")
    p.add_argument("--rejig", action="store_true")
    p.add_argument("--sparse-exec", action="store_true",
                   help="run eligible masked convs of the STUDENT through "
                        "the fused block-sparse kernel in all three train "
                        "passes (DRN archs only — CIFAR-zoo channel widths "
                        "are never /128); ineligible layers stay "
                        "masked-dense (see semantic_seg --sparse-exec)")
    p.add_argument("--resume", default=None)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="with --evaluate: also evaluate an int8 PTQ serving "
                        "copy (per-layer QuantConv plans; tpuseg.ops.quant) and "
                        "report its top-1/5, wall time, and prediction "
                        "agreement vs the float path")
    p.add_argument("--save-dir", default="runs/cls")
    p.add_argument("--ckpt-format", default="npz", choices=["npz", "orbax"],
                   help="checkpoint envelope: single-file npz or orbax "
                        "directory (async save, multi-host coordination)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32", choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each backbone stage-group "
                        "(jax.checkpoint): large-batch KD runs trade ~1/3 "
                        "extra forward FLOPs for stage-boundary peak HBM")
    p.add_argument("--synthetic-n", type=int, default=256)
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="cap the data-parallel mesh at N local devices "
                        "(0 = all local devices whose count divides the batch)")
    # multi-host init (replaces --world-size/--rank/--dist-url,
    # rmbsnn_main.py:93-101; NCCL becomes XLA-over-ICI/DCN)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for multi-host runs")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args(argv)


def build_model(args, arch, classes):
    from tpuseg.models.cifar import CIFAR_ARCHS, create_cifar_model
    from tpuseg.models.drn import DRN_ARCHS, build_drn_spec, init_drn

    if arch in CIFAR_ARCHS:
        return create_cifar_model(args.seed, arch, classes)
    if arch in DRN_ARCHS:
        spec = build_drn_spec(arch, num_classes=classes, naming="cls")
        params, state = init_drn(args.seed, spec)
        return params, state, spec
    raise ValueError(f"unknown arch {arch!r}")


def load_into(params, state, path):
    if path.endswith(".pth"):
        from tpuseg.models.torch_import import load_pth

        p, s, _ = load_pth(path)
    else:
        from tpuseg.train import load_checkpoint

        p, s, _, _, _ = load_checkpoint(path)
    params.update(p)
    state.update(s)


def main(argv=None):
    args = parse_args(argv)
    from tpuseg.parallel import configure_backend_from_env

    configure_backend_from_env()
    if args.num_processes and args.num_processes > 1:
        if args.coordinator is None or args.process_id is None:
            raise SystemExit(
                "--num-processes > 1 requires --coordinator host:port and "
                "--process-id"
            )
        from tpuseg.parallel import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax
    import jax.numpy as jnp

    from tpuseg.data.classification import SyntheticClassDataset, make_class_datasets
    from tpuseg.data.loaders import batch_iterator, prefetch_to_device
    from tpuseg.metrics import AverageMeter, top_k_accuracy
    from tpuseg.models.factory import num_classes_for_dataset
    from tpuseg.sparsity import create_masker, mask_sparsity_stats
    from tpuseg.train import (
        create_train_state,
        make_cls_train_step,
        make_eval_step,
        make_sgd,
        save_checkpoint,
        sparsity_aware_reinit,
    )
    from tpuseg.train.optim import step30_schedule, milestones_for_epochs, multistep_schedule
    from tpuseg.train.trainer import classifier_forward

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    if args.dataset == "synthetic":
        classes = 10
        chan = 3
        train_ds = SyntheticClassDataset(args.synthetic_n, 32, chan, classes, args.seed)
        val_ds = train_ds
    else:
        classes = num_classes_for_dataset(args.dataset)
        train_ds, val_ds = make_class_datasets(args.dataset, args.data, args.seed)

    params, state, spec = build_model(args, args.arch, classes)
    if args.base_model:
        load_into(params, state, args.base_model)

    teacher = None
    if args.teacher_model:
        t_arch = args.teacher_arch or args.arch
        t_params, t_state, t_spec = build_model(args, t_arch, classes)
        load_into(t_params, t_state, args.teacher_model)
        t_fwd_full = classifier_forward(t_spec, compute_dtype)
        teacher = (
            lambda p, s, x: t_fwd_full(p, s, x, train=False)[0],
            {k: jnp.asarray(v) for k, v in t_params.items()},
            {k: jnp.asarray(v) for k, v in t_state.items()},
        )

    masks = None
    if args.mc_pruning and args.pr_config_path:
        masker = create_masker(args.pr_config_path, seed=args.seed)
        masks = masker.generate_masks(params, is_static=args.pr_static, verbose=True)
        for layer, sp in mask_sparsity_stats(masks).items():
            print(layer, f"sparsity = {sp}")
        if args.rejig and args.pr_static:
            params = sparsity_aware_reinit(params, masks, np.random.default_rng(args.seed))

    start_epoch = 0
    best_acc1 = 0.0
    resume_opt = None
    if args.resume:
        from tpuseg.train import load_checkpoint

        p, s, m, resume_opt, meta = load_checkpoint(args.resume)
        params, state = dict(p), dict(s)
        if m:
            masks = m
        start_epoch = int(meta.get("epoch", 0))
        best_acc1 = float(meta.get("best_acc1", 0.0))
        print(f"=> resumed '{args.resume}' (epoch {start_epoch})")

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    if args.dataset == "imagenet" and args.epochs == 100:
        sched = step30_schedule(args.lr, steps_per_epoch)
    else:
        sched = multistep_schedule(
            args.lr, milestones_for_epochs(args.epochs), 0.1, steps_per_epoch
        )
    tx = make_sgd(sched, args.momentum, args.weight_decay)
    ts = create_train_state(params, state, tx, masks)
    if resume_opt:
        from tpuseg.train.checkpoint import restore_opt_state

        ts = ts.__class__(
            params=ts.params,
            bn_state=ts.bn_state,
            opt_state=restore_opt_state(ts.opt_state, resume_opt),
            masks=ts.masks,
            step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32),
        )

    # data-parallel mesh (replaces DDP wrap + per-GPU batch division,
    # rmbsnn_main.py:215-228)
    from tpuseg.parallel import (
        put_global_batch,
        replicate,
        setup_data_parallel,
        shard_train_step,
    )

    mesh, _repl_sharding, data_sharding, local_bs = setup_data_parallel(
        args.batch_size, args.mesh_devices
    )
    n_proc = jax.process_count()
    pid = jax.process_index()
    is_main = pid == 0
    if is_main and (mesh.devices.size > 1 or n_proc > 1):
        print(json.dumps({
            "mesh": {"data": int(mesh.devices.size), "processes": n_proc,
                     "local_batch": local_bs, "global_batch": args.batch_size},
        }))
    ts = replicate(mesh, ts)
    sparse_plans = None
    if getattr(args, "sparse_exec", False):
        from tpuseg.models.cifar import CifarSpec

        if isinstance(spec, CifarSpec):
            raise SystemExit(
                "--sparse-exec requires a DRN arch (CIFAR-zoo channel "
                "widths are never /128; no eligible layer exists)"
            )
        if masks is None:
            raise SystemExit(
                "--sparse-exec requires masks (--mc-pruning "
                "--pr-config-path ... or a resumed checkpoint with masks)"
            )
        from tpuseg.ops.sparse_train import build_sparse_train_structs

        sparse_plans, sparse_report = build_sparse_train_structs(masks, spec)
        if is_main:
            print(json.dumps({"sparse_exec": sparse_report}))
        if not sparse_plans:
            if is_main:
                print("warning: --sparse-exec found no eligible layer; "
                      "running masked-dense")
            sparse_plans = None
    step_fn = shard_train_step(make_cls_train_step(
        spec, tx, compute_dtype=compute_dtype, teacher=teacher,
        kd_student_wt=args.kd_student_wt, kd_distill_wt=args.kd_distill_wt,
        kd_temperature=args.kd_temperature, remat=args.remat,
        sparse_plans=sparse_plans,
    ), mesh)
    data_put = lambda x: put_global_batch(data_sharding, x)  # noqa: E731
    fwd = classifier_forward(spec, compute_dtype)
    eval_fwd = jax.jit(lambda p, s, x: fwd(p, s, x, train=False)[0])

    def collect_logits(fwd_jit):
        if n_proc > 1:
            eval_params = jax.tree.map(np.asarray, ts.params)
            eval_bn = jax.tree.map(np.asarray, ts.bn_state)
        else:
            eval_params, eval_bn = ts.params, ts.bn_state
        logits_all, labels_all = [], []
        for images, labels in prefetch_to_device(
            batch_iterator(val_ds, local_bs, num_shards=n_proc,
                           shard_index=pid)
        ):
            logits_all.append(np.asarray(fwd_jit(eval_params, eval_bn, images)))
            labels_all.append(np.asarray(labels))
        logits = np.concatenate(logits_all)
        labels = np.concatenate(labels_all)
        if n_proc > 1:
            from jax.experimental import multihost_utils

            # process_allgather needs equal shapes, but dropping the tail
            # (drop_last) silently excluded up to n_proc*local_bs-1 val
            # samples, so multi-process top-1/5 differed from the
            # single-process run on the same checkpoint (round-3 advisor;
            # the reference pads via DistributedSampler).  Instead pad
            # every shard to the max shard length (ceil(n/n_proc) — shard
            # i holds ceil((n-i)/n_proc) samples, computable without
            # communication), gather a valid mask alongside, and drop the
            # padding after the gather: full-val-set coverage, no dupes.
            max_n = -(-len(val_ds) // n_proc)
            valid = np.zeros(max_n, bool)
            valid[: len(logits)] = True
            padn = max_n - len(logits)
            if padn:
                logits = np.concatenate(
                    [logits, np.zeros((padn,) + logits.shape[1:], logits.dtype)])
                labels = np.concatenate(
                    [labels, np.zeros((padn,) + labels.shape[1:], labels.dtype)])
            logits = np.concatenate(multihost_utils.process_allgather(logits))
            labels = np.concatenate(multihost_utils.process_allgather(labels))
            mask = np.concatenate(multihost_utils.process_allgather(valid))
            logits, labels = logits[mask], labels[mask]
        return logits, labels

    def validate():
        logits, labels = collect_logits(eval_fwd)
        top1, top5 = top_k_accuracy(logits, labels, topk=(1, min(5, classes)))
        return top1, top5

    if args.evaluate:
        t0 = time.time()
        logits, labels = collect_logits(eval_fwd)
        t_fp = time.time() - t0
        top1, top5 = top_k_accuracy(logits, labels, topk=(1, min(5, classes)))
        out = {"acc1": round(top1, 3), "acc5": round(top5, 3),
               "seconds": round(t_fp, 3)}
        if args.quantize:
            # int8 PTQ serving copy via the same per-layer exec-plan
            # dispatch the seg pipeline uses (ref eval: rmbsnn_main.py:502-549)
            from tpuseg.models.cifar import CifarSpec, cifar_forward
            from tpuseg.models.drn import drn_forward
            from tpuseg.ops.quant import build_cls_quant_plans, build_quant_plans

            host_params = jax.tree.map(np.asarray, ts.params)
            if isinstance(spec, CifarSpec):
                plans = build_cls_quant_plans(
                    host_params, groups=getattr(spec, "groups", 1))
                q_fwd = jax.jit(lambda p, s, x: cifar_forward(
                    p, s, x, spec, train=False, compute_dtype=compute_dtype,
                    plans=plans)[0])
            else:
                plans = build_quant_plans(host_params, spec)
                q_fwd = jax.jit(lambda p, s, x: drn_forward(
                    p, s, x, spec, train=False, compute_dtype=compute_dtype,
                    sparse_plans=plans)[0])
            t0 = time.time()
            q_logits, q_labels = collect_logits(q_fwd)
            t_q = time.time() - t0
            q1, q5 = top_k_accuracy(q_logits, q_labels, topk=(1, min(5, classes)))
            out.update({
                "int8_acc1": round(q1, 3), "int8_acc5": round(q5, 3),
                "int8_seconds": round(t_q, 3),
                "int8_layers": len(plans),
                "pred_agreement": round(float(
                    (q_logits.argmax(-1) == logits.argmax(-1)).mean()), 4),
            })
        if is_main:  # one result line, not one per process
            print(json.dumps(out))
        return

    os.makedirs(args.save_dir, exist_ok=True)
    for epoch in range(start_epoch, args.epochs):
        losses = AverageMeter("loss")
        accs = AverageMeter("acc")
        t0 = time.time()
        for images, labels in prefetch_to_device(
            batch_iterator(train_ds, local_bs, shuffle=True, drop_last=True,
                           epoch=epoch, num_shards=n_proc, shard_index=pid),
            put=data_put,
        ):
            ts, m = step_fn(ts, images, labels)
            losses.update(float(np.asarray(m["loss"])), len(labels))
            accs.update(float(np.asarray(m["acc"])) * 100, len(labels))
        top1, top5 = validate()
        is_best = top1 > best_acc1
        best_acc1 = max(best_acc1, top1)
        # npz: rank-0-only save, like the reference's DDP guard
        # (rmbsnn_main.py:414-415).  orbax: EVERY process must call save —
        # its commit protocol runs cross-process barriers and elects the
        # writer itself; a rank-0 guard would deadlock process 0
        if is_main or args.ckpt_format == "orbax":
            save_checkpoint(
                join(args.save_dir, "checkpoint." + args.ckpt_format),
                ts.params, ts.bn_state, opt_state=ts.opt_state, masks=ts.masks,
                meta={"epoch": epoch + 1, "arch": args.arch,
                      "best_acc1": best_acc1, "dataset": args.dataset},
                is_best=is_best,
                async_save=(args.ckpt_format == "orbax"),
            )
        if is_main:
            print(json.dumps({
                "epoch": epoch, "train_loss": round(losses.avg, 4),
                "train_acc": round(accs.avg, 3), "acc1": round(top1, 3),
                "acc5": round(top5, 3), "seconds": round(time.time() - t0, 2),
            }))
    if args.ckpt_format == "orbax":
        from tpuseg.train.orbax_ckpt import wait_for_saves

        wait_for_saves()  # don't exit with an uncommitted async save


if __name__ == "__main__":
    main()
