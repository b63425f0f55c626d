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

import numpy as np

from hpfg_tpu.parallel.mesh import shard_batch

_SENTINEL = object()


# The class-id batch keys across every loader/algorithm (data/loader.py,
# train/algorithms/*): 'label' and HPFG's second labeled batch 'label1'.
LABEL_KEYS = ("label", "label1")


def compress_wire(batch: dict) -> dict:
    """Shrink the H2D wire format: float32/64 → float16, small non-negative
    int labels → uint8 (class ids incl. the 255 ignore value fit exactly).

    Measured on the dev TPU tunnel: H2D sustains only ~40-50 MB/s, so the
    8 MB canonical batch costs ~160 ms/iter — more than the 47 ms train
    step. Halving/quartering the bytes is the difference between a
    transfer-bound and a compute-bound loop (on real hosts it still halves
    PCIe traffic). ``restore_wire_dtypes`` undoes it inside the jitted step
    (a free on-device cast).

    Int compression is decided STATICALLY by key name (the class-id batch
    keys, LABEL_KEYS), never from per-batch values: a value-dependent dtype
    would flip between uint8 and int32 across batches and silently
    retrigger the multi-minute recompile of the donated train step. A
    substring match ('label' in k) would also be wrong: an unrelated int
    field named e.g. 'num_labeled' or 'labeled_idx' must pass through
    uncompressed, not crash the range check. Class-id labels outside
    [0, 255] are a schema error and raise."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.dtype in (np.float64, np.float32):
            out[k] = v.astype(np.float16)
        elif v.dtype in (np.int64, np.int32) and k in LABEL_KEYS:
            if v.size and (v.min() < 0 or v.max() > 255):
                raise ValueError(
                    f"compress_wire: int field {k!r} has values outside "
                    f"[0, 255] (min {v.min()}, max {v.max()}); class-id "
                    "labels must fit uint8 (255 = ignore)")
            out[k] = v.astype(np.uint8)
        else:
            out[k] = v
    return out


def restore_wire_dtypes(batch: dict) -> dict:
    """In-jit inverse of compress_wire (f16 → f32, uint8 → int32)."""
    import jax.numpy as jnp

    def restore(v):
        if v.dtype == jnp.float16:
            return v.astype(jnp.float32)
        if v.dtype == jnp.uint8:
            return v.astype(jnp.int32)
        return v

    return {k: restore(v) for k, v in batch.items()}


class DevicePrefetcher:
    """Wrap a host batch iterator; yields mesh-sharded DEVICE batches.

    depth: max batches in flight (2 is enough to hide H2D under compute;
    larger only adds HBM pressure). compress: shrink the wire format (see
    compress_wire) — consumers must apply restore_wire_dtypes inside their
    jitted step (the Trainer does)."""

    def __init__(self, batches: Iterator[dict], mesh, depth: int = 2,
                 compress: bool = True):
        self._src = batches
        self._mesh = mesh
        self._compress = compress
        self._q: queue.Queue = queue.Queue(maxsize=max(int(depth), 1))
        self._stop = threading.Event()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="device-prefetch")
        self._thread.start()

    def _worker(self) -> None:
        try:
            for batch in self._src:
                if self._compress:
                    batch = compress_wire(batch)
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
