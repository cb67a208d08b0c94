"""Device-mesh parallelism.

This module replaces the reference's entire distributed layer (SURVEY.md
§2.5): ``torch.nn.DataParallel`` (semantic_seg.py:809-815), DDP +
``dist.init_process_group('nccl')`` (semantic_seg_multigpu.py:460-526,
rmbsnn_main.py:162-238) and ``mp.spawn`` — with a ``jax.sharding.Mesh`` and
``NamedSharding`` annotations.  XLA inserts the gradient all-reduce (psum)
over ICI inside the jitted train step; no process groups, no explicit
collectives, one Python process per host.

Axes:
- ``data``    — batch-dim data parallelism (the only parallelism the
  reference has)
- ``spatial`` — optional sharding of the image H dimension for inputs whose
  activations exceed one chip's HBM (1024x2048 Cityscapes frames); XLA SPMD
  inserts halo exchanges for the convolutions automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host init (replaces ``dist.init_process_group``,
    rmbsnn_main.py:169-170).  No-op on single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def configure_backend_from_env() -> None:
    """Honor TPUSEG_PLATFORM / TPUSEG_NUM_CPU_DEVICES before backend init.

    The axon PJRT relay in this environment pins ``jax_platforms`` at
    interpreter boot (overriding JAX_PLATFORMS), so subprocess tests that
    need a local N-device CPU backend set these env vars and the CLIs apply
    them before the first ``jax.devices()`` call.  No-op once the backend is
    initialized.
    """
    import os

    plat = os.environ.get("TPUSEG_PLATFORM")
    ncpu = os.environ.get("TPUSEG_NUM_CPU_DEVICES")
    try:
        if plat:
            jax.config.update("jax_platforms", plat)
        if ncpu:
            jax.config.update("jax_num_cpu_devices", int(ncpu))
    except RuntimeError:
        pass


def data_parallel_size(batch_size: int, n_devices: int) -> int:
    """Largest device count ≤ ``n_devices`` that divides ``batch_size``."""
    d = max(1, min(batch_size, n_devices))
    while batch_size % d:
        d -= 1
    return d


def setup_data_parallel(batch_size: int, mesh_devices: int = 0):
    """Build the training mesh + shardings for a trainer CLI.

    Returns ``(mesh, repl_sharding, data_sharding, local_batch_size)``.
    The reference gets this via DataParallel (semantic_seg.py:809-815) or
    DDP with per-GPU batch division (semantic_seg_multigpu.py:509-511);
    here one mesh covers both: single-process uses the largest divisor of
    the batch among local devices, multi-process uses ALL global devices
    and treats ``batch_size`` as the GLOBAL batch, each process feeding
    ``batch_size // process_count`` samples that are assembled into global
    arrays (so XLA's gradient all-reduce spans hosts — the DDP-backward
    equivalent, rmbsnn_main.py:477-484).
    """
    n_proc = jax.process_count()
    if n_proc > 1:
        n_dev = len(jax.devices())
        if batch_size % n_dev:
            raise SystemExit(
                f"--batch-size {batch_size} must be divisible by the global "
                f"device count {n_dev} in multi-process mode"
            )
        if batch_size % n_proc:
            raise SystemExit(
                f"--batch-size {batch_size} must be divisible by "
                f"--num-processes {n_proc}"
            )
        dp = n_dev
        local_bs = batch_size // n_proc
    else:
        avail = len(jax.devices())
        cap = mesh_devices if mesh_devices and mesh_devices > 0 else avail
        dp = data_parallel_size(batch_size, min(cap, avail))
        local_bs = batch_size
    mesh = make_mesh(data=dp, spatial=1, devices=jax.devices()[:dp])
    return (
        mesh,
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P("data")),
        local_bs,
    )


def put_global_batch(sharding: NamedSharding, x: np.ndarray):
    """Device-put one per-process batch array as a GLOBAL sharded array.

    Single-process: plain sharded device_put.  Multi-process: the local
    array is this process's slice of the global batch; assemble the global
    array so the jitted step's mean-loss gradient all-reduces across hosts.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def make_mesh(
    data: int | None = None,
    spatial: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // spatial
    assert data * spatial == n, f"mesh {data}x{spatial} != {n} devices"
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (weights)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard array(s) along their leading (batch) dimension."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_train_step(
    train_step: Callable,
    mesh: Mesh,
    donate_state: bool = True,
    spatial: bool = False,
) -> Callable:
    """Compile a train step for data parallelism over ``mesh``.

    State (params/opt/masks/bn) is replicated; images/labels are sharded on
    the batch axis.  The loss is a mean over the global batch, so XLA emits
    one all-reduce for the grads — the moral equivalent of DDP's bucketed
    NCCL all-reduce, but fused and ICI-routed.

    ``spatial=True`` additionally shards the image/label H dimension over
    the mesh's ``spatial`` axis (for crops whose training activations
    exceed one chip's HBM); XLA SPMD inserts the conv halo exchanges and
    keeps the loss a global mean, so gradients are identical to the
    unsharded step up to float associativity.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data", "spatial") if spatial
                         else P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, data),
        donate_argnums=(0,) if donate_state else (),
    )


def spatial_forward(forward: Callable, mesh: Mesh) -> Callable:
    """Compile a forward fn with activations sharded over H (NHWC dim 1).

    For 1024x2048 inputs whose intermediate activations would blow past one
    chip's HBM; XLA SPMD partitions the convs with halo exchange on ICI.
    """
    repl = NamedSharding(mesh, P())
    img = NamedSharding(mesh, P(None, "spatial", None, None))
    return jax.jit(forward, in_shardings=(repl, repl, img))
