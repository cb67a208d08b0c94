"""Cityscapes segmentation trainer CLI — the canonical entry point.

Parity with /root/reference/semantic_seg.py (cmd in {train, test, calc},
parse_args at :675-761, main at :775-1119):

- train: DRNSeg + optional pruner (JSON config via --pr-config-path),
  SGD+momentum with MultiStepLR, per-epoch val mIoU, checkpoint/best-copy,
  static-mask "rejig" re-init, per-epoch mask sparsity stats
- test: mIoU evaluation over the val list (+ optional multi-scale --ms),
  prediction / colorized dumps
- calc: parameter + FLOP count

TPU-native differences: one jitted train step (mask re-apply fused in),
data-parallel mesh instead of DataParallel/DDP, threaded device prefetch
instead of loader workers, npz checkpoints (with .pth import), masks
checkpointed for deterministic resume.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from os.path import join

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tpuseg semantic segmentation")
    p.add_argument("cmd", choices=["train", "test", "calc"])
    p.add_argument("-d", "--data-dir", default=None)
    p.add_argument("-l", "--list-dir", default=None,
                   help="list dir with {phase}_images.txt (defaults to data-dir)")
    p.add_argument("-c", "--classes", type=int, default=19)
    p.add_argument("-s", "--crop-size", type=int, default=0)
    p.add_argument("--arch", default="drn_d_22")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--lr-mode", default="step", choices=["step", "poly"])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--random-scale", type=float, default=0)
    p.add_argument("--random-rotate", type=int, default=0)
    p.add_argument("--pretrained", default=None, help=".npz or .pth weights")
    p.add_argument("--pretrained-backbone", default=None,
                   help="ImageNet-pretrained DRN classifier to bootstrap "
                        "the backbone from: local .pth path, http(s) URL "
                        "(cached under $TPUSEG_CACHE), or 'auto' for the "
                        "arch's published URL — the reference's "
                        "pretrained=True contract (drn.py:15-24)")
    p.add_argument("--resume", default=None, help="checkpoint to resume from")
    p.add_argument("--save-dir", default="runs/seg")
    p.add_argument("--ckpt-format", default="npz", choices=["npz", "orbax"],
                   help="checkpoint envelope: single-file npz (atomic "
                        "tmp+rename) or orbax directory (async background "
                        "save + multi-host write coordination)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of the first "
                        "epoch into this directory (TensorBoard/Perfetto)")
    p.add_argument("--ms", action="store_true", help="multi-scale test")
    p.add_argument("--scales", default="0.5,0.75,1.25,1.5,1.75")
    p.add_argument("--save-vis", action="store_true",
                   help="dump class-id and colorized prediction PNGs")
    # pruning (reference flags: --mc_pruning, --pr_config_path, --pr_static)
    p.add_argument("--mc-pruning", action="store_true")
    p.add_argument("--pr-config-path", default=None)
    p.add_argument("--pr-static", action="store_true")
    p.add_argument("--rejig", action="store_true",
                   help="sparsity-aware reinit for static masks")
    p.add_argument("--sparse-exec", action="store_true",
                   help="execute eligible masked convs (stride 1, channels "
                        "/128, block-structured mask) through the fused "
                        "block-sparse kernel in ALL THREE train passes "
                        "(fwd/dgrad/wgrad) at the mask's union block "
                        "density, instead of reference-semantics masked-"
                        "dense; ineligible layers stay masked-dense and "
                        "eval keeps the (equivalent) dense-masked forward. "
                        "Unmasked-weight trajectory matches masked-dense "
                        "up to float associativity (tests/test_sparse_train.py)")
    p.add_argument("--unstructured-sparsity", type=float, default=0.0,
                   help="semseg_unstructured-style L1 magnitude pruning")
    p.add_argument("--random-unstructured", type=float, default=0.0,
                   help="semseg_baseline-style random unstructured pruning "
                        "(ref semseg_baseline.py:752)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each backbone stage (jax.checkpoint): "
                        "backward recomputes stage internals instead of "
                        "keeping every activation live — fits larger "
                        "crops/batches in HBM; mathematically exact "
                        "(rounding-level bf16 differences on TPU only)")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="cap the data-parallel mesh at N local devices "
                        "(0 = use all local devices whose count divides "
                        "the batch; 1 = single-device)")
    p.add_argument("--num-shards", type=int, default=1, help="hosts")
    p.add_argument("--shard-index", type=int, default=0)
    # multi-host init (replaces --world-size/--rank/--dist-url/--dist-backend,
    # semantic_seg.py:728-744; NCCL becomes XLA-over-ICI/DCN)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for multi-host runs")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic samples instead of a dataset (smoke tests)")
    p.add_argument("--eval-every", type=int, default=1)
    return p.parse_args(argv)


class SyntheticSegDataset:
    """Random (image, label) pairs for smoke tests on machines without
    Cityscapes."""

    def __init__(self, n, size, classes, seed=0):
        self.n, self.size, self.classes, self.seed = n, size, classes, seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(self.seed * 100003 + i)
        h = w = self.size
        img = rng.random((h, w, 3), dtype=np.float32)
        lbl = rng.integers(0, self.classes, size=(h, w)).astype(np.int32)
        lbl[rng.random((h, w)) < 0.05] = 255
        return img, lbl


def build_dataset(args, phase, out_name=False):
    if args.synthetic:
        size = args.crop_size or 64
        return SyntheticSegDataset(args.synthetic, size, args.classes, args.seed)
    from tpuseg.data import SegList
    from tpuseg.data.cityscapes import load_info
    from tpuseg.data import transforms as T

    info = load_info(args.data_dir)
    rng = np.random.default_rng(args.seed)
    if phase == "train":
        ts = []
        if args.random_rotate > 0:
            ts.append(T.RandomRotate(args.random_rotate, rng))
        if args.random_scale > 0:
            ts.append(T.RandomScale(args.random_scale, rng))
        ts.extend([
            T.RandomCrop(args.crop_size, rng),
            T.RandomHorizontalFlip(rng),
            T.ToArray(),
            T.Normalize(info["mean"], info["std"]),
        ])
    else:
        ts = [T.ToArray(), T.Normalize(info["mean"], info["std"])]
    return SegList(args.data_dir, phase, T.Compose(ts), list_dir=args.list_dir,
                   out_name=out_name)


def load_weights(args, classes):
    import jax.numpy as jnp
    from tpuseg.models import init_drnseg
    from tpuseg.models.drn import build_drn_spec

    params, state, spec = init_drnseg(args.seed, args.arch, classes)
    if getattr(args, "pretrained_backbone", None):
        from tpuseg.models.torch_import import load_pretrained_backbone

        params, state, n = load_pretrained_backbone(
            args.arch, args.pretrained_backbone, params, state)
        print(json.dumps({"pretrained_backbone": args.pretrained_backbone,
                          "tensors": n}))
    if args.pretrained:
        if args.pretrained.endswith(".pth"):
            from tpuseg.models.torch_import import load_pth

            p, s, _ = load_pth(args.pretrained)
        else:
            from tpuseg.train import load_checkpoint

            p, s, _, _, _ = load_checkpoint(args.pretrained)
        params.update(p)
        state.update(s)
    return params, state, spec


def make_masker(args, params):
    """Pruner dispatch (semantic_seg.py:830-849)."""
    masks = None
    masker = None
    if args.mc_pruning and args.pr_config_path:
        from tpuseg.sparsity import create_masker

        masker = create_masker(args.pr_config_path, seed=args.seed)
        masks = masker.generate_masks(params, is_static=args.pr_static, verbose=True)
    elif args.unstructured_sparsity > 0:
        from tpuseg.train import magnitude_unstructured_masks

        masks = magnitude_unstructured_masks(params, args.unstructured_sparsity)
    elif getattr(args, "random_unstructured", 0) > 0:
        from tpuseg.train.unstructured import random_unstructured_masks

        masks = random_unstructured_masks(
            params, args.random_unstructured, np.random.default_rng(args.seed)
        )
    return masker, masks


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from tpuseg.data.loaders import batch_iterator, prefetch_to_device
    from tpuseg.metrics import AverageMeter, fast_hist, miou_from_hist
    from tpuseg.sparsity import mask_sparsity_stats
    from tpuseg.train import (
        create_train_state,
        make_eval_step,
        make_seg_train_step,
        make_sgd,
        milestones_for_epochs,
        multistep_schedule,
        poly_schedule,
        save_checkpoint,
        sparsity_aware_reinit,
    )

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    params, state, spec = load_weights(args, args.classes)
    masker, masks = make_masker(args, params)
    if masks is not None:
        print("mask sparsity:", json.dumps(
            {k: round(v, 2) for k, v in mask_sparsity_stats(masks).items()}
        ))
    if masks is not None and args.unstructured_sparsity > 0:
        # global-sparsity report during unstructured training
        # (ref semseg_unstructured.py:780-787)
        from tpuseg.cli.semseg_unstructured import report_global_sparsity

        report_global_sparsity(params, masks)
    if args.rejig and masks is not None and args.pr_static:
        params = sparsity_aware_reinit(
            params, masks, np.random.default_rng(args.seed)
        )

    train_ds = build_dataset(args, "train")
    val_ds = build_dataset(args, "val") if not args.synthetic else train_ds
    steps_per_epoch = max(1, len(train_ds) // args.batch_size)

    start_epoch = 0
    meta_resume = {}
    if args.resume:
        from tpuseg.train import load_checkpoint

        p, s, m, opt_arrays, meta_resume = load_checkpoint(args.resume)
        params, state = p, s
        if m:
            masks = m
        start_epoch = int(meta_resume.get("epoch", 0))

    if args.lr_mode == "poly":
        sched = poly_schedule(args.lr, args.epochs * steps_per_epoch)
    else:
        milestones = milestones_for_epochs(args.epochs, start_epoch)
        sched = multistep_schedule(args.lr, milestones, 0.1, steps_per_epoch)
    tx = make_sgd(sched, args.momentum, args.weight_decay)
    ts = create_train_state(params, state, tx, masks)
    if args.resume:
        from tpuseg.train.checkpoint import restore_opt_state

        ts = ts.__class__(
            params=ts.params,
            bn_state=ts.bn_state,
            opt_state=restore_opt_state(ts.opt_state, opt_arrays),
            masks=ts.masks,
            step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32),
        )

    # Data-parallel mesh over the local (or, multi-process, global) devices —
    # the reference reaches multi-device training via DataParallel
    # (semantic_seg.py:809-815) or the DDP trainer
    # (semantic_seg_multigpu.py:460-526); here the SAME jitted step runs on a
    # jax.sharding.Mesh with the batch sharded on the 'data' axis and XLA
    # inserting the gradient all-reduce over ICI/DCN.
    from tpuseg.parallel import (
        put_global_batch,
        replicate,
        setup_data_parallel,
        shard_train_step,
    )

    mesh, repl_sharding, data_sharding, local_bs = setup_data_parallel(
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
        # real sparse execution of the train loop (the measured 1.39x win,
        # docs/PERF_NOTES.md): plan from the FINAL masks (post-resume)
        if masks is None:
            raise SystemExit(
                "--sparse-exec requires masks (--mc-pruning "
                "--pr-config-path ..., --unstructured-sparsity, or a "
                "resumed checkpoint with masks)"
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
    step_fn = shard_train_step(
        make_seg_train_step(
            spec, tx, compute_dtype=compute_dtype, remat=args.remat,
            sparse_plans=sparse_plans,
        ),
        mesh,
    )
    eval_fn = jax.jit(make_eval_step(spec, "seg", compute_dtype=compute_dtype))
    data_put = lambda x: put_global_batch(data_sharding, x)  # noqa: E731

    os.makedirs(args.save_dir, exist_ok=True)
    # persistent run logging: JSONL + TensorBoard event files with a
    # hyperparameter-carrying run record (ref semantic_seg.py:1010-1024)
    from tpuseg.metrics.runlog import RunLogger

    runlog = RunLogger(
        args.save_dir, run_name="",
        hparams={"arch": args.arch, "lr": args.lr, "lr_mode": args.lr_mode,
                 "batch_size": args.batch_size, "epochs": args.epochs,
                 "crop_size": args.crop_size,
                 "pr_config": args.pr_config_path or "",
                 "unstructured": args.unstructured_sparsity},
    ) if is_main else None
    best_miou = float(meta_resume.get("best_miou", 0.0))

    for epoch in range(start_epoch, args.epochs):
        losses = AverageMeter("loss")
        t_epoch = time.time()
        it = batch_iterator(
            train_ds, local_bs, shuffle=True, drop_last=True,
            epoch=epoch, num_shards=args.num_shards, shard_index=args.shard_index,
        )
        from tpuseg.metrics.profiling import trace

        # device trace of the first trained epoch when requested (the
        # TPU-native replacement for the reference's AverageMeter timing)
        with trace(args.profile_dir if epoch == start_epoch else None):
            for images, labels in prefetch_to_device(it, put=data_put):
                ts, m = step_fn(ts, images, labels)
                losses.update(float(np.asarray(m["loss"])), len(images))
        line = {
            "epoch": epoch,
            "train_loss": round(losses.avg, 4),
            "epoch_seconds": round(time.time() - t_epoch, 2),
            "lr": float(sched(int(np.asarray(ts.step)))),
        }

        is_best = False
        if (epoch + 1) % args.eval_every == 0:
            hist = np.zeros((args.classes, args.classes), dtype=np.int64)
            if n_proc > 1:
                # each process evaluates its own shard locally (params are
                # replicated, hence fully addressable), then one allgather
                # merges the confusion matrices
                eval_params = jax.tree.map(np.asarray, ts.params)
                eval_bn = jax.tree.map(np.asarray, ts.bn_state)
            else:
                eval_params, eval_bn = ts.params, ts.bn_state
            for images, labels in prefetch_to_device(
                batch_iterator(val_ds, local_bs,
                               num_shards=args.num_shards,
                               shard_index=args.shard_index)
            ):
                _, preds = eval_fn(eval_params, eval_bn, images, labels)
                hist += fast_hist(
                    np.asarray(preds).flatten(),
                    np.asarray(labels).flatten(),
                    args.classes,
                )
            if n_proc > 1:
                from jax.experimental import multihost_utils

                # process_allgather routes through jnp.asarray, which
                # silently narrows int64 -> int32 with x64 disabled —
                # large pixel counts would wrap.  Gather the matrix as
                # two int32 halves and recombine exactly.
                lo = (hist & 0x7FFFFFFF).astype(np.int32)
                hi = (hist >> 31).astype(np.int32)
                glo, ghi = multihost_utils.process_allgather((lo, hi))
                hist = (
                    np.asarray(glo, np.int64).sum(axis=0)
                    + (np.asarray(ghi, np.int64).sum(axis=0) << 31)
                )
            miou = miou_from_hist(hist)
            line["val_miou"] = round(miou, 3)
            # reference baseline's independent pixel-accuracy report
            # (semseg_baseline.py:120-131); derived from the same hist
            total = hist.sum()
            if total:
                line["val_pixel_acc"] = round(
                    float(np.diag(hist).sum() / total) * 100, 2
                )
            is_best = miou > best_miou
            best_miou = max(best_miou, miou)
        # checkpoint EVERY epoch (the reference saves per-epoch too,
        # semantic_seg.py:1085-1092; saving only at eval epochs would lose
        # up to eval_every-1 epochs on preemption); writes are atomic
        # (tmp + rename) so kill-mid-save leaves the previous file intact
        # npz: rank-0 writes the file (the other replicas hold identical
        # params).  orbax: EVERY process must call save — its commit
        # protocol runs cross-process barriers and elects the writer
        # itself (tpuseg/train/orbax_ckpt.py); a rank-0 guard would leave
        # process 0 blocked on a barrier the others never reach
        if is_main or args.ckpt_format == "orbax":
            save_checkpoint(
                join(args.save_dir, "checkpoint." + args.ckpt_format),
                ts.params, ts.bn_state,
                opt_state=ts.opt_state, masks=ts.masks,
                meta={"epoch": epoch + 1, "arch": args.arch,
                      "best_miou": best_miou, "dataset": "cityscapes"},
                is_best=is_best,
                # orbax saves run on a background thread; epoch N+1 trains
                # while epoch N commits (npz ignores the flag)
                async_save=(args.ckpt_format == "orbax"),
            )
        if n_proc > 1 and os.environ.get("TPUSEG_SAVE_ALL_PROCS"):
            # debug hook for the multi-host lockstep test: every process
            # dumps its replica so the test can assert they are identical
            save_checkpoint(
                join(args.save_dir, f"replica_proc{pid}.npz"),
                ts.params, ts.bn_state,
                meta={"epoch": epoch + 1, "process": pid},
            )
        if masks is not None:
            # per-epoch pruner stats (pruner.print_stats each epoch,
            # semantic_seg.py:1094-1095) — measured on the live weights
            weight_sparsity = {
                k: round(
                    float((np.asarray(ts.params[k]) == 0).mean()) * 100, 2
                )
                for k in masks
            }
            line["mean_weight_sparsity"] = round(
                float(np.mean(list(weight_sparsity.values()))), 2
            )
        if is_main:
            print(json.dumps(line))
            runlog.log(epoch, line)
    if runlog is not None:
        runlog.close()
    if args.ckpt_format == "orbax":
        from tpuseg.train.orbax_ckpt import wait_for_saves

        wait_for_saves()  # don't exit with an uncommitted async save
    return best_miou


def _save_predictions(preds, names, out_dir, palette=None):
    """save_output_images / save_colorful_images parity
    (semantic_seg.py:85-112)."""
    from PIL import Image

    for pred, name in zip(preds, names):
        fn = os.path.join(out_dir, str(name)[:-4] + ".png")
        os.makedirs(os.path.dirname(fn) or ".", exist_ok=True)
        arr = pred.astype(np.uint8)
        if palette is not None:
            arr = palette[arr]
        Image.fromarray(arr).save(fn)


def cmd_test(args):
    import jax
    import jax.numpy as jnp

    from tpuseg.data.cityscapes import CITYSCAPE_PALETTE
    from tpuseg.data.loaders import batch_iterator, prefetch_to_device
    from tpuseg.metrics import fast_hist, miou_from_hist, per_class_iu
    from tpuseg.models.drnseg import drnseg_forward
    from tpuseg.train import make_eval_step

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    params, state, spec = load_weights(args, args.classes)
    _, masks = make_masker(args, params)
    if masks is not None:
        from tpuseg.sparsity import apply_masks

        params = apply_masks(params, masks)

    hist = np.zeros((args.classes, args.classes), dtype=np.int64)

    if args.ms:
        # multi-scale evaluation (test_ms, semantic_seg.py:507-557): forward
        # at the base scale + each extra scale, bilinear-resize the logits
        # back (device-side), sum, argmax
        from tpuseg.data import SegListMS
        from tpuseg.data import transforms as T
        from tpuseg.data.cityscapes import load_info

        scales = [float(s) for s in args.scales.split(",")]
        info = load_info(args.data_dir)
        ts = T.Compose([T.ToArray(), T.Normalize(info["mean"], info["std"])])
        ds = SegListMS(args.data_dir, "val", ts, scales, list_dir=args.list_dir)

        fwd = jax.jit(
            lambda p, s, v: drnseg_forward(
                p, s, v, spec, train=False, compute_dtype=compute_dtype
            )[0],
            static_argnames=(),
        )

        for idx in range(len(ds)):
            item = ds[idx]
            image, label, name, ms_images = item[0], item[1], item[-2], item[-1]
            h, w = image.shape[:2]
            total = np.zeros((h, w, args.classes), np.float32)
            for im in [image] + list(ms_images):
                out = fwd(params, state, jnp.asarray(im)[None])
                out = jax.image.resize(out[0], (h, w, args.classes), "bilinear")
                total += np.asarray(out, np.float32)
            pred = total.argmax(axis=-1)
            if args.save_vis:
                out_dir = join(args.save_dir, "pred")
                _save_predictions([pred], [name], out_dir)
                _save_predictions(
                    [pred], [name], out_dir + "_color", CITYSCAPE_PALETTE
                )
            hist += fast_hist(pred.flatten(), np.asarray(label).flatten(),
                              args.classes)
    else:
        # --save-vis needs the image names in the batch (the reference's
        # test-time SegList is built with out_name=True, semantic_seg.py:588)
        val_ds = build_dataset(args, "val" if not args.synthetic else "train",
                               out_name=args.save_vis)
        eval_fn = jax.jit(make_eval_step(spec, "seg", compute_dtype=compute_dtype))
        for batch in prefetch_to_device(batch_iterator(val_ds, args.batch_size)):
            images, labels = batch[0], batch[1]
            _, preds = eval_fn(params, state, images, labels)
            if args.save_vis and len(batch) > 2:
                out_dir = join(args.save_dir, "pred")
                _save_predictions(np.asarray(preds), batch[2], out_dir)
                _save_predictions(
                    np.asarray(preds), batch[2], out_dir + "_color",
                    CITYSCAPE_PALETTE,
                )
            hist += fast_hist(
                np.asarray(preds).flatten(), np.asarray(labels).flatten(),
                args.classes,
            )
    ious = per_class_iu(hist) * 100
    miou = miou_from_hist(hist)
    print(" ".join(f"{i:.2f}" for i in ious))
    print(json.dumps({"miou": round(miou, 3)}))
    return miou


def cmd_calc(args):
    """Parameter / FLOP count (parity with pthflops + torchsummary usage,
    semantic_seg.py:819,1116-1119) — FLOPs from the jaxpr cost analysis."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models.drnseg import drnseg_forward

    params, state, spec = load_weights(args, args.classes)
    n_params = sum(int(np.asarray(v).size) for v in params.values())
    size = args.crop_size or 512

    def fwd(p, s, x):
        return drnseg_forward(p, s, x, spec, train=False)[0]

    x = jnp.zeros((1, size, size, 3))
    lowered = jax.jit(fwd).lower(params, state, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(json.dumps({"params": n_params, "flops": flops, "input": f"{size}x{size}"}))


def main(argv=None):
    args = parse_args(argv)
    from tpuseg.parallel import configure_backend_from_env

    configure_backend_from_env()
    if args.num_processes and args.num_processes > 1:
        if args.coordinator is None or args.process_id is None:
            raise SystemExit(
                "--num-processes > 1 requires --coordinator host:port and "
                "--process-id (one process per host, "
                "jax.distributed.initialize semantics)"
            )
        from tpuseg.parallel import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes, args.process_id)
        args.num_shards = args.num_processes
        args.shard_index = args.process_id or 0
    if args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "test":
        cmd_test(args)
    else:
        cmd_calc(args)


if __name__ == "__main__":
    main()
