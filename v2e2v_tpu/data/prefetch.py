"""Host->device prefetching data pipeline.

The reference used torch DataLoader worker processes (``train_e2v.py:61``).
TPU-idiomatic equivalent: a background thread pipelines dataset __getitem__ /
decode / voxelize (CPU) ahead of the device step, and batches are moved to
device (optionally sharded) one step early so the accelerator never waits on
the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch_iterator(it: Iterable, size: int = 2) -> Iterator:
    """Run ``it`` in a background thread with a bounded buffer."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    err: list[BaseException] = []

    def producer():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


def device_prefetch(
    batches: Iterable,
    transform: Callable = None,
    sharding=None,
    size: int = 2,
) -> Iterator:
    """Prefetch host batches and place them on device ahead of consumption.

    ``transform(batch) -> pytree`` runs on host (e.g. axis moves);
    ``sharding`` (a ``jax.sharding.Sharding`` or pytree of them) controls
    placement — replicated/sharded across the mesh.
    """
    import jax

    def produce():
        for batch in batches:
            if transform is not None:
                batch = transform(batch)
            if sharding is not None:
                batch = jax.device_put(batch, sharding)
            else:
                batch = jax.device_put(batch)
            yield batch

    return prefetch_iterator(produce(), size=size)
