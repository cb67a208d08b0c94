"""End-to-end sparse DRN inference: masks -> fused-kernel execution plans.

Completes the compression story: a pruner config generates masks, and this
module lowers every eligible masked conv to the fused block-sparse Pallas
kernel, so high-sparsity models get real wall-clock speedups on the whole
network (not simulated masking).

Eligibility per conv (tpuseg.ops.sparse_conv constraints):
- stride 1 (DRN's FLOP-dominant dilated stages 5-8 and all 1x1 downsamples
  in those stages qualify; the stride-2 stage entries stay dense)
- cin and cout multiples of 128 (MXU block grid)
- coarsened block density below ``dense_threshold`` (fine-grained RBGP
  blocklets coarsen to dense and stay on the XLA path)

Use with BN-folded params (tpuseg.ops.fold_bn) for inference.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import numpy as np

import jax
import jax.numpy as jnp

from tpuseg.models.drn import DrnSpec
from tpuseg.ops.sparse_conv import FusedSparseConv, plan_fused_sparse_conv

# Max live-block density at which a 1x1 conv still pays for the gathered
# lowering's activation gather (no tap loop amortizes it — see the
# eligibility comment in build_sparse_plans; measured ladder on the v5e
# chip: 1.10x at 0.125, 1.01x at 0.25, 0.95x at 0.5 vs dense).
GATHER_1X1_MAX_DENSITY = 0.13


@dataclasses.dataclass
class CompactSparse:
    """Composition of the two sparse lowerings: dead input channels are
    sliced away (rbgp column compaction) and the COMPACTED conv still runs
    through the fused block-sparse Pallas kernel.

    At 87.5% coarse block sparsity, compaction alone gives the dead-channel
    fraction (2-4x FLOPs) but executes the survivor dense; the fused kernel
    alone gathers all live K-blocks.  Composing multiplies the wins: the
    gather runs on half the channels AND the kernel skips the remaining
    dead blocks."""

    live_in: np.ndarray          # (n_live,) int32 input-channel gather
    inner: FusedSparseConv

    def apply(self, x: jax.Array) -> jax.Array:
        from tpuseg.ops.sparse_conv import fused_sparse_conv_apply

        return fused_sparse_conv_apply(x[..., self.live_in], self.inner)


@dataclasses.dataclass
class CompactSparseQ:
    """CompactSparse with an int8-quantized inner kernel — the full
    compression stack (prune + compact + quantize) on one layer."""

    live_in: np.ndarray
    inner: "object"  # FusedSparseConvQ

    def apply(self, x: jax.Array) -> jax.Array:
        from tpuseg.ops.sparse_conv import fused_sparse_conv_apply_q

        return fused_sparse_conv_apply_q(x[..., self.live_in], self.inner)


def quantize_sparse_plans(plans: dict, x_scales: dict | None = None) -> dict:
    """Quantize a sparse execution-plan dict to int8 where a quantized
    lowering exists (FusedSparseConv and CompactSparse -> int8 fused
    kernel; other plan kinds pass through unchanged).  ``x_scales`` maps
    conv name -> static activation scale (tpuseg.ops.quant.calibrate
    semantics); absent entries use dynamic in-graph absmax."""
    from tpuseg.ops.gathered_conv import GatheredGroupConv, quantize_gathered_plan
    from tpuseg.ops.sparse_conv import quantize_fused_plan

    out: dict = {}
    for name, p in plans.items():
        xs = (x_scales or {}).get(name)
        if isinstance(p, FusedSparseConv):
            out[name] = quantize_fused_plan(p, x_scale=xs)
        elif isinstance(p, CompactSparse):
            out[name] = CompactSparseQ(
                p.live_in, quantize_fused_plan(p.inner, x_scale=xs))
        elif isinstance(p, GatheredGroupConv):
            out[name] = quantize_gathered_plan(p, x_scale=xs)
        else:
            out[name] = p
    return out


def build_sparse_plans(
    params: Mapping,
    masks: Mapping,
    spec: DrnSpec,
    dense_threshold: float = 0.75,
    dtype=jnp.bfloat16,
    rows_per_tile: int = 8,
    lowering: str = "pallas",
    gathered_mode: str = "exact",
) -> tuple[dict, dict]:
    """Build ``{conv_name: FusedSparseConv}`` for every eligible masked conv.

    Returns (plans, report) where report maps every masked conv to the
    decision taken ('sparse d=..' / 'dense: <reason>').

    ``lowering`` picks the sparse execution family for eligible convs:
    ``"pallas"`` (fused block-sparse kernel, with channel compaction when
    the mask admits it) or ``"gathered"`` (channel-gather + small dense XLA
    convs, tpuseg.ops.gathered_conv — sidesteps the Pallas xmat copy
    floor).  Round-4 hardware record (PERF_NOTES): gathered measured at or
    above pallas at every density — model-level 1.60x bf16 / 1.66x int8 at
    87.5% vs 1.25x/1.38x — so the serving CLI defaults to gathered; the
    library default stays "pallas" for API stability and because both
    families are production paths.  Structured RBGP lowerings apply first
    in either case.

    ``gathered_mode`` selects the gathered execution form: ``"exact"``
    (default — per-out-block exact supports, dead out-blocks emit zeros
    with no conv; strictly fewer FLOPs than uniform padding) or
    ``"split"`` (uniform repeat-padded supports).
    """
    assert lowering in ("pallas", "gathered"), lowering
    convs = {}
    for _, stage in spec.stages:
        if stage.kind == "convs":
            for cdef, _bn in stage.convs:
                convs[cdef.name] = cdef
        else:
            for blk in stage.blocks:
                for cdef in blk.convs:
                    convs[cdef.name] = cdef
                if blk.downsample is not None:
                    convs[blk.downsample[0].name] = blk.downsample[0]

    from tpuseg.ops.rbgp_matmul import plan_rbgp

    plans: dict = {}
    report: dict = {}
    for mask_name, mask in masks.items():
        if not mask_name.endswith(".weight"):
            continue
        cname = mask_name[: -len(".weight")]
        cdef = convs.get(cname)
        if cdef is None:
            continue
        w = np.asarray(params[mask_name], np.float32)
        mk = np.asarray(mask, np.float32)

        # RBGP structured lowerings first: COLUMN/GROUP-style patterns admit
        # dense-compacted execution at any stride (tpuseg.ops.rbgp_matmul)
        rplan = plan_rbgp(w, mk, dtype=dtype)
        if (
            rplan.kind == "column_compact"
            and cdef.stride == 1
            and lowering == "pallas"
        ):
            # compose: compact the dead channels away AND run the survivor
            # through the fused block-sparse kernel when it is still sparse
            live = np.asarray(rplan.live_in)
            if (
                live.size % 128 == 0
                and cdef.cout % 128 == 0
                and live.size >= 128
            ):
                wc = w[:, :, live, :]
                mc = mk[:, :, live, :]
                fplan = plan_fused_sparse_conv(
                    wc, mc, dilation=cdef.dilation, dtype=dtype,
                    rows_per_tile=rows_per_tile,
                )
                if fplan.block_density < dense_threshold:
                    plans[cname] = CompactSparse(live.astype(np.int32), fplan)
                    report[cname] = (
                        f"compact+sparse: {cdef.cin - live.size}/{cdef.cin} "
                        f"dead channels, survivor block density "
                        f"{fplan.block_density:.2f}"
                    )
                    continue
        if (
            rplan.kind != "dense"
            and not (rplan.kind == "tap_compact" and cdef.stride != 1)
            and not (
                # the gathered lowering subsumes channel compaction (its
                # gather indices already skip dead K-blocks); let it take
                # stride-1 column_compact layers instead
                lowering == "gathered"
                and rplan.kind == "column_compact"
                and cdef.stride == 1
                and cdef.cin % 128 == 0
                and cdef.cout % 128 == 0
            )
        ):
            plans[cname] = rplan
            report[cname] = f"rbgp {rplan.kind}: {rplan.note}"
            continue

        if cdef.stride != 1:
            report[cname] = "dense: stride != 1"
            continue
        if cdef.cin % 128 or cdef.cout % 128:
            report[cname] = f"dense: channels {cdef.cin}x{cdef.cout} not /128"
            continue
        if lowering == "gathered":
            from tpuseg.ops.gathered_conv import plan_gathered_conv

            gplan = plan_gathered_conv(
                w, mk, dilation=cdef.dilation, dtype=dtype,
                mode=gathered_mode,
            )
            if gplan.block_density >= dense_threshold:
                report[cname] = (
                    f"dense: block density {gplan.block_density:.2f}"
                )
                continue
            if w.shape[0] == 1 and w.shape[1] == 1:
                # 1x1 convs have no tap loop to amortize the channel
                # gather: the gathered re-materialization of activations
                # is pure extra HBM traffic against a single small GEMM.
                # Measured on DRN-D-54 (bottleneck arch, 24 gathered 1x1
                # plans, v5e chip, PERF_NOTES round 5 "1x1 gathered
                # eligibility"): lowering them all serves at 0.92x DENSE;
                # per-density bands 1.10x at 1/8, wash at 1/4, 0.95x at
                # 1/2.  Rule: lower a 1x1 only when the gather is nearly
                # free (block density <= GATHER_1X1_MAX_DENSITY) or exact
                # mode can skip dead out-blocks entirely (the raw-
                # geometry win).  Composed-set validation: the rule
                # lifted d54 block128reg serving 1.17x -> 1.52x and left
                # raw block128 unchanged.
                dead = gathered_mode == "exact" and any(
                    len(ks) == 0 for ks in gplan.idx
                )
                if gplan.block_density > GATHER_1X1_MAX_DENSITY and not dead:
                    report[cname] = (
                        f"dense: 1x1 gather unpaid (block density "
                        f"{gplan.block_density:.2f} > "
                        f"{GATHER_1X1_MAX_DENSITY}, no dead out-blocks)"
                    )
                    continue
            plans[cname] = gplan
            report[cname] = (
                f"gathered[{gathered_mode}]: block density "
                f"{gplan.block_density:.2f}, S={gplan.s}"
            )
            continue
        plan = plan_fused_sparse_conv(
            w, mk, dilation=cdef.dilation, dtype=dtype,
            rows_per_tile=rows_per_tile,
        )
        if plan.block_density >= dense_threshold:
            report[cname] = (
                f"dense: union block density {plan.block_density:.2f}"
                + (f"; {rplan.note}" if "periodic" in rplan.note else "")
            )
            continue
        plans[cname] = plan
        report[cname] = f"sparse: union block density {plan.block_density:.2f}"
    return plans, report
