"""TensorBoard writing (reference channel: tensorboardX SummaryWriter scalars +
palette image panels, e.g. main.py:216-228, val.py:170-185).

Wrapped so the rest of the framework never imports tensorboardX directly and
tests can run with a no-op writer.
"""

from __future__ import annotations

import numpy as np


class TBWriter:
    """Thin wrapper over tensorboardX.SummaryWriter with a disabled mode."""

    def __init__(self, logdir: str | None):
        self._writer = None
        if logdir is not None:
            from tensorboardX import SummaryWriter  # local import: optional dep

            self._writer = SummaryWriter(logdir)

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(np.asarray(value)), step)

    def add_scalars(self, scalars: dict, step: int, prefix: str = "") -> None:
        for k, v in scalars.items():
            tag = f"{prefix}/{k}" if prefix else k
            self.add_scalar(tag, v, step)

    def add_image(self, tag: str, img: np.ndarray, step: int,
                  dataformats: str = "HWC") -> None:
        if self._writer is not None:
            self._writer.add_image(tag, np.asarray(img), step,
                                   dataformats=dataformats)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
