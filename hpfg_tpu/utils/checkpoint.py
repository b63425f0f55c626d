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

    def save(self, tag: str, state: Any) -> None:
        path = self._path(tag)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()

    def restore(self, tag: str, target: Any) -> Any:
        """Restore into the structure of ``target`` (an abstract or concrete
        state pytree)."""
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckpt.restore(self._path(tag), abstract)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))
