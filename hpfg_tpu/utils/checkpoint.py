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
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state: Any, block: bool = False) -> None:
        """Save ``state``. Non-blocking by default: orbax's
        StandardCheckpointer copies device→host synchronously (so donating
        the state to the next train step is safe) and commits to disk in the
        background — the train loop never waits on IO. Pass ``block=True``
        (or call wait()) to force durability, e.g. for the final save."""
        path = self._path(tag)
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
