"""Logging + filesystem helpers (reference: utils/logger.py:15-34, utils/utils.py:22-30)."""

from __future__ import annotations

import logging
import logging.handlers
import os
import shutil

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


def mk_path(path: str, remove: bool = False) -> None:
    """Create a directory; optionally clear it first (reference: utils/utils.py:22-30)."""
    if remove and os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)


def get_logger(filename: str | None = None, verbosity: str = "info",
               name: str = "hpfg_tpu") -> logging.Logger:
    """Console + (optionally) daily-rotating file logger
    (reference: utils/logger.py:15-34 uses a TimedRotatingFileHandler on 'D')."""
    logger = logging.getLogger(name)
    logger.setLevel(_LEVELS.get(verbosity, logging.INFO))
    logger.propagate = False
    if logger.handlers:  # idempotent across repeated calls in one process
        return logger
    fmt = logging.Formatter(
        "[%(asctime)s][%(filename)s][line:%(lineno)d][%(levelname)s] %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename:
        mk_path(os.path.dirname(filename) or ".")
        fh = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", encoding="utf-8")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
