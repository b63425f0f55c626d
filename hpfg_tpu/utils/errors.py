"""TPU/XLA error decoding + crash-resilience helpers.

The reference has no failure-handling story (SURVEY §5.3); on TPU the common
failure modes surface as opaque ``XlaRuntimeError``s whose root causes are
environment-specific and hard-won (see CLAUDE.md). This module turns them
into actionable diagnostics and backs the Trainer's periodic-checkpoint +
auto-resume policy.
"""

from __future__ import annotations

# Known opaque failure signatures -> root-cause hints, ordered by specificity.
_SIGNATURES: list[tuple[tuple[str, ...], str]] = [
    (("donat", "twice"),
     "A pytree passed to a donate_argnums step has ALIASED leaves (e.g. an "
     "EMA teacher initialized as a reference to the student instead of a "
     "fresh copy). Fix: tree_copy() at init (train/algorithms/base.py)."),
    (("resource_exhausted",),
     "HBM out of memory: lower batch_size/unlabel_batch_size, enable "
     "jax.checkpoint rematerialization, or shard over more chips."),
    (("invalid_argument", "donation"),
     "Buffer-donation mismatch: the donated input is still referenced "
     "elsewhere (same array passed twice into one step?)."),
    (("invalid_argument",),
     "Opaque TPU InvalidArgument: on this backend the usual causes are "
     "(1) a second process using the TPU concurrently — only ONE TPU job "
     "may run at a time; (2) donated-buffer aliasing in the state pytree."),
    (("deadline", "exceeded"),
     "TPU RPC deadline exceeded: the device runtime is wedged (often a "
     "crashed concurrent job). Re-running usually recovers; training can "
     "auto-resume from the periodic checkpoint."),
    (("unavailable", "socket"),
     "TPU runtime connection lost: the device server restarted. Resume "
     "from the periodic checkpoint (auto_resume=1)."),
]


def decode_tpu_error(exc: BaseException) -> str | None:
    """Map a raised accelerator error to a human-actionable hint, or None."""
    text = f"{type(exc).__name__}: {exc}".lower()
    for needles, hint in _SIGNATURES:
        if all(n in text for n in needles):
            return hint
    return None


class error_hints:
    """Context manager: on an accelerator failure, log the decoded
    root-cause hint before re-raising (used around training entry points)."""

    def __init__(self, logger=None):
        self.logger = logger

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc is not None:
            hint = decode_tpu_error(exc)
            if hint is not None:
                msg = f"accelerator failure: {exc}\nHINT: {hint}"
                if self.logger is not None:
                    self.logger.error(msg)
                else:
                    import sys

                    print(msg, file=sys.stderr)
        return False
