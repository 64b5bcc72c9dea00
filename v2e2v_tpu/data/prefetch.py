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
    """Run ``it`` in a background thread with a bounded buffer.

    Abandonment-safe: if the consumer drops this generator mid-stream (e.g.
    a train step raised), its ``finally`` signals the producer, which stops
    iterating and CLOSES the source iterator — so resources held by source
    generators (like an ephemeral worker pool in ``iterate_batches``) are
    released instead of leaking behind a thread blocked on ``q.put``.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def producer():
        src = iter(it)
        try:
            while not stop.is_set():
                try:
                    item = next(src)
                except StopIteration:
                    break
                except BaseException as e:  # surfaced on the consumer side
                    err.append(e)
                    break
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        finally:
            close = getattr(src, "close", None)
            if close is not None:
                close()
            # blocking-with-stop put: the queue may be FULL of unconsumed
            # items here, and dropping _END would hang the consumer forever;
            # only an abandoning consumer (stop set) may discard it
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # unblock a producer waiting on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)


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
