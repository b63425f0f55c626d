"""Multi-host (multi-process) distributed substrate.

The reference is strictly single-GPU — every entry script comments
"single-card, no distributed needed" (reference: main.py:44) and no
NCCL/Gloo/MPI init exists anywhere (SURVEY §2.7). For TPU pods the
equivalent substrate is:

  * ``jax.distributed.initialize`` — one process per host, all hosts see
    the global device set; collectives ride ICI within a slice,
  * per-process host data loading: each process materializes only its own
    shard of the global batch and assembles the global array with
    ``jax.make_array_from_process_local_data``,
  * process-0 gating for logging / TensorBoard / checkpoint writes.

Single-process runs (the dev box, unit tests) degrade to no-ops: every
helper below is safe to call unconditionally.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from hpfg_tpu.parallel.mesh import DATA_AXIS, batch_sharding

_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Initialize multi-process JAX if requested; return True if multi-host.

    Accepts explicit arguments or the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``;
    on Cloud TPU pods ``jax.distributed.initialize()`` auto-discovers all of
    these from the TPU metadata server, so bare ``init_distributed()`` works
    there too). A plain single-process run — no args, no env — is a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process: nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the process that owns logging / TB / checkpoint writes."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def global_batch_from_local(mesh, local_batch: Any,
                            axis_name: str = DATA_AXIS) -> Any:
    """Assemble a globally-sharded batch from per-process host shards.

    Each process passes the slice of the global batch its own loader
    produced (global leading dim = local leading dim × process_count); the
    result is a global ``jax.Array`` sharded along the data axis that can be
    fed straight into a pjit-ed step. Single-process this is equivalent to a
    sharded ``device_put``.
    """
    def put(x):
        x = np.asarray(x)
        sharding = batch_sharding(mesh, x.ndim, axis_name)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-process barrier (used around checkpoint writes)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def coordination_barrier(tag: str = "barrier",
                         timeout_s: float = 1200.0) -> None:
    """Barrier over the COORDINATION SERVICE (not device collectives).

    ``sync_global_devices`` runs a device all-reduce, and the very first
    collective also creates the backend communicator context — whose
    internal key-value handshake has a short (~30 s) timeout. When
    per-process XLA compile times are long and skewed (e.g. many processes
    contending for few host cores), the first process to reach the
    collective can time out waiting for the stragglers. This barrier rides
    the coordination service RPC channel instead, accepts an explicit
    timeout, and compiles nothing — call it immediately before the first
    collective/compile so every process enters within milliseconds of each
    other and the communicator handshake only sees compile-time skew.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    client.wait_at_barrier(tag, timeout_in_ms=int(timeout_s * 1000),
                           process_ids=None)
