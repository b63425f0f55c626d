"""Double-buffered host→device batch pipeline.

Round-1 measurement (BENCH_NOTES.md): the sustained Trainer loop reached
only ~37% of the raw step throughput because ``shard_batch`` (host assembly
+ H2D transfer) ran INLINE between steps — the device idled during every
transfer, and the host idled during every step.

This prefetcher moves batch assembly + ``device_put`` to a background thread
with a small bounded queue (depth 2 = classic double buffering): while step
N executes on device, batch N+1 is already crossing PCIe/the tunnel. JAX
dispatch is thread-safe for independent computations, and ``device_put`` of
a fresh host array never aliases donated step buffers.

Worker exceptions re-raise in the training thread (same policy as the
threaded loaders, data/loader.py)."""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

from hpfg_tpu.parallel.mesh import shard_batch

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a host batch iterator; yields mesh-sharded DEVICE batches.

    depth: max batches in flight (2 is enough to hide H2D under compute;
    larger only adds HBM pressure)."""

    def __init__(self, batches: Iterator[dict], mesh, depth: int = 2):
        self._src = batches
        self._mesh = mesh
        self._q: queue.Queue = queue.Queue(maxsize=max(int(depth), 1))
        self._stop = threading.Event()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="device-prefetch")
        self._thread.start()

    def _worker(self) -> None:
        try:
            for batch in self._src:
                device_batch = shard_batch(self._mesh, batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(device_batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._put_forever(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — surfaced to the consumer
            self._err = e
            self._put_forever(_SENTINEL)

    def _put_forever(self, item: Any) -> None:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise RuntimeError("device prefetch worker failed") from self._err
            raise StopIteration
        return item

    def close(self) -> None:
        self._stop.set()
