"""Host-side batching + device prefetch.

Replaces torch DataLoader worker-pools with a thread that keeps a
double-buffered queue of device-resident batches so the TPU never waits on
host preprocessing (the TPU answer to ``pin_memory=True`` + workers,
semantic_seg.py:911-915).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np

import jax


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    drop_last: bool = False,
    epoch: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
) -> Iterator[tuple]:
    """Yield tuples of stacked numpy batches.

    ``num_shards``/``shard_index`` give per-host sharding (the moral
    equivalent of DistributedSampler + set_epoch, utils.py:47,
    rmbsnn_main.py:397-398 — the ``epoch`` arg reseeds the shuffle).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        r = rng or np.random.default_rng(epoch)
        r.shuffle(order)
    if num_shards > 1 and drop_last:
        # equalize step counts across shards — otherwise hosts whose shard
        # got one extra sample would run an extra collective step and hang
        # (the reference's DistributedSampler pads for the same reason)
        n_even = (n // (num_shards * batch_size)) * (num_shards * batch_size)
        order = order[:n_even]
    order = order[shard_index::num_shards]
    end = len(order) - (len(order) % batch_size) if drop_last else len(order)
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        samples = [dataset[int(i)] for i in idx]
        fields = list(zip(*samples))
        out = []
        for f in fields:
            if isinstance(f[0], (np.ndarray, np.generic, int, float)):
                out.append(np.stack(f))
            else:
                out.append(list(f))
        yield tuple(out)


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    sharding=None,
    put: Callable | None = None,
) -> Iterator:
    """Run the host iterator in a background thread, moving batches to device
    (optionally with a NamedSharding) ``size`` steps ahead of compute.

    ``put`` overrides the array placement (e.g.
    ``tpuseg.parallel.put_global_batch`` for multi-host global batches)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()
    error: list[BaseException] = []
    if put is None:
        put = lambda x: jax.device_put(x, sharding)  # noqa: E731

    def producer():
        try:
            for item in iterator:
                moved = jax.tree.map(
                    lambda x: put(x) if isinstance(x, np.ndarray) else x,
                    item,
                )
                q.put(moved)
        except BaseException as exc:  # re-raised in the consumer
            error.append(exc)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                # surface producer failures instead of silently truncating
                # the epoch (a corrupt sample would otherwise look like a
                # short dataset and train/eval on partial data)
                raise error[0]
            break
        yield item
