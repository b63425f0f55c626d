"""Device mesh + sharding helpers.

The reference is strictly single-GPU ("single-card, no distributed needed",
reference: main.py:44); here data parallelism over a `jax.sharding.Mesh` is a
first-class component. The design is GSPMD-style:

  * parameters / optimizer state / EMA state are replicated,
  * batches are sharded along the leading axis over the ``data`` mesh axis,
  * everything else (gradient psum, cross-replica batch-norm statistics, the
    batch-wide similarity matrices of the contrastive losses — the role of the
    reference's dead `GatherLayer`, utils/loss/NT_Xent.py:5-21) falls out of
    jit-compiling the global program: XLA inserts the all-reduces/all-gathers
    over ICI automatically.

A one-device mesh degrades to plain jit, so the same code path runs on a
single chip, a v4-8 slice, or an 8-way virtual CPU mesh in the test suite.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


_MESH_CACHE: dict[int, Mesh] = {}


def get_mesh() -> Mesh:
    """Process-wide default mesh over all local devices (cached)."""
    n = len(jax.devices())
    if n not in _MESH_CACHE:
        _MESH_CACHE[n] = make_mesh()
    return _MESH_CACHE[n]


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a pytree of host arrays with the leading axis sharded.

    Training loaders produce divisible batches by construction (drop_last
    batching, reference: datasets/ACDC.py:127-129); a non-divisible leading
    axis is a loud error — silent replication would duplicate compute on
    every chip (use :func:`pad_and_shard` for eval-style ragged batches).

    Multi-process (multi-host) runs: each process passes its *local* shard
    of the global batch (global leading dim = local × process_count) and the
    leaves are assembled into global arrays via
    ``jax.make_array_from_process_local_data`` (SURVEY.md §5.8).
    """
    n = mesh.devices.size
    multiprocess = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        sharding = batch_sharding(mesh, x.ndim, axis_name)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        if x.shape[0] % n != 0:
            raise ValueError(
                f"batch leading dim {x.shape[0]} does not divide the "
                f"{n}-device mesh; use pad_and_shard() for ragged batches")
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_cached(mesh: Mesh, tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put [E, B, ...] epoch-cache arrays with axis 1 (the batch
    axis) sharded and the epoch axis replicated (train/trainer.py
    device-cache mode)."""
    def put(x):
        x = np.asarray(x)
        spec = P(None, axis_name, *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def pad_and_shard(mesh: Mesh, x: Any, axis_name: str = DATA_AXIS):
    """Zero-pad the leading axis up to a mesh-size multiple and shard it.

    Returns ``(sharded_array, n_valid)``; consumers mask out the padded
    rows (`jnp.arange(n_padded) < n_valid`). This replaces round-1's silent
    full replication of non-divisible eval batches.
    """
    x = np.asarray(x)
    n = mesh.devices.size
    n_valid = x.shape[0]
    pad = (-n_valid) % n
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name)), n_valid


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
