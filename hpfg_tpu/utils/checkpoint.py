"""Checkpointing via orbax.

Reference behavior: torch.save of {model, optimizer, lr_scheduler state,
cur_itrs, best_dice} whenever dice improves, one file per tracked model
(2017_03…py:127-150, main.py:234-275). The reference's resume path is buggy
(assigns raw state_dicts instead of load_state_dict, sup_ACDC.py:74-80);
here resume restores the EXACT state pytree (params, optimizer state, EMA,
step, rng) so training continues bit-identically.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _is_device_array(x) -> bool:
    return isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer)


class _HostGather:
    """Device→host state gather with ONE transfer per dtype group.

    Handing orbax a device pytree makes its synchronous device→host copy
    pay the tunnel's per-transfer floor once PER LEAF (~150 leaves ≈
    0.33 s per save — EVAL_COST_r05 `rotating_ckpt_s`; up to three saves
    fire per eval boundary). Instead: a cached jitted packer concatenates
    all raveled leaves of each dtype into one buffer on device, the few
    buffers cross in single transfers, and the host reslices them into a
    numpy pytree that orbax saves without touching the device."""

    def __init__(self):
        self._packers: dict = {}

    def __call__(self, state: Any) -> Any:
        leaves, treedef = jax.tree_util.tree_flatten(state)
        if not leaves or not all(_is_device_array(l) for l in leaves):
            return state  # host/mixed pytrees pass through unchanged
        sig = (treedef, tuple((l.shape, str(l.dtype)) for l in leaves))
        if sig not in self._packers:
            groups: dict = {}
            for i, l in enumerate(leaves):
                groups.setdefault(str(l.dtype), []).append(i)
            order = sorted(groups)

            def pack(ls):
                return tuple(
                    jnp.concatenate([ls[i].reshape(-1) for i in groups[dt]])
                    if len(groups[dt]) > 1 else ls[groups[dt][0]].reshape(-1)
                    for dt in order)

            self._packers[sig] = (jax.jit(pack), groups, order)
        packer, groups, order = self._packers[sig]
        buffers = [np.asarray(b) for b in packer(leaves)]  # one D2H each
        out: list = [None] * len(leaves)
        for dt, buf in zip(order, buffers):
            offset = 0
            for i in groups[dt]:
                n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
                out[i] = buf[offset:offset + n].reshape(leaves[i].shape)
                offset += n
        return jax.tree_util.tree_unflatten(treedef, out)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._gather = _HostGather()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state: Any, block: bool = False) -> None:
        """Save ``state``. Non-blocking by default: orbax copies
        device→host synchronously (so donating the state to the next train
        step is safe) and commits to disk in the background — the train
        loop never waits on IO. Pass ``block=True`` (or call wait()) to
        force durability, e.g. for the final save.

        ``HPFG_CKPT_PACK=1`` routes the device→host copy through
        _HostGather (one packed transfer per dtype instead of one per
        leaf). A/B'd on the dev tunnel (BENCH_NOTES round-5): the packed
        slug rides the tunnel's slow bulk rate and LOST to ~150 small
        floor-bound transfers (sustained 760 vs 794) — default off; on
        production interconnects the packed form is the right shape, so
        the machinery stays."""
        path = self._path(tag)
        if os.environ.get("HPFG_CKPT_PACK", "0") == "1":
            state = self._gather(state)
        self._ckpt.save(path, state, force=True)
        if block:
            self._ckpt.wait_until_finished()

    def wait(self) -> None:
        """Block until all pending async saves are committed to disk."""
        self._ckpt.wait_until_finished()

    # Crash-recovery rotation: save(force=True) DELETES the existing target
    # directory before the async commit lands, so overwriting a single
    # 'last' tag in place has a window where a crash destroys the only
    # recovery point — exactly when auto_resume is needed. Alternate
    # between two tags instead; resume picks the newest COMMITTED one
    # (orbax writes to a tmp dir and renames atomically, so a directory
    # that exists is complete).
    _ROTATE_TAGS = ("last_a", "last_b")

    def save_rotating(self, state: Any) -> None:
        """Non-blocking crash-recovery save alternating last_a/last_b."""
        if not hasattr(self, "_rot_idx"):
            # First write targets the OLDER committed slot: after a restart
            # (fresh manager, resumed from the newest slot) starting at a
            # fixed index could delete the newest recovery point before its
            # replacement commits — the exact window the rotation closes.
            mtimes = [os.path.getmtime(self._path(t)) if self.exists(t)
                      else -1.0 for t in self._ROTATE_TAGS]
            self._rot_idx = 0 if mtimes[0] <= mtimes[1] else 1
        tag = self._ROTATE_TAGS[self._rot_idx]
        self._rot_idx ^= 1
        self.save(tag, state)

    def latest_resume_tag(self, preferred: str = "last") -> str | None:
        """Newest committed tag among ``preferred``/last_a/last_b, by
        mtime; None when no resume point exists."""
        candidates = [t for t in (preferred,) + self._ROTATE_TAGS
                      if self.exists(t)]
        if not candidates:
            return None
        return max(candidates,
                   key=lambda t: os.path.getmtime(self._path(t)))

    def restore(self, tag: str, target: Any = None) -> Any:
        """Restore into the structure of ``target`` (an abstract or concrete
        state pytree); with ``target=None`` returns the raw saved pytree as
        nested dicts (used for cross-model transfers, utils/pretrain.py)."""
        self._ckpt.wait_until_finished()  # never read a half-written save
        if target is None:
            return self._ckpt.restore(self._path(tag))
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckpt.restore(self._path(tag), abstract)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))
