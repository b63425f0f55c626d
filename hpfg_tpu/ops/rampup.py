"""Consistency-weight ramp-up schedules (reference: utils/utils.py:67-95).

Implemented as jnp functions of a (possibly traced) step so they can live
inside a jitted train step instead of being recomputed on host every
iteration.
"""

from __future__ import annotations

import jax.numpy as jnp

#: The reference feeds ramp-ups an EPOCH counter derived as
#: ``iter // 150`` — 150 iterations per nominal epoch is a constant baked
#: into every reference trainer (e.g. 2017_03…ACDC.py:139 ``iter_num//150``).
#: Algorithms read it from ``cfg.epoch_unit_iters`` (default below) so a
#: config with a different epoch length can retune the ramp without code
#: edits.
DEFAULT_EPOCH_ITERS = 150


def sigmoid_rampup(current, rampup_length: float) -> jnp.ndarray:
    """exp(-5 * (1 - t)^2) ramp (reference: utils/utils.py:72-79)."""
    if rampup_length == 0:
        return jnp.asarray(1.0, jnp.float32)
    current = jnp.clip(jnp.asarray(current, jnp.float32), 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length: float) -> jnp.ndarray:
    """Linear 0→1 ramp (reference: utils/utils.py:89-95)."""
    if rampup_length == 0:
        return jnp.asarray(1.0, jnp.float32)
    current = jnp.asarray(current, jnp.float32)
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def get_current_consistency_weight(step, consistency: float,
                                   consistency_rampup: float) -> jnp.ndarray:
    """consistency * sigmoid_rampup(step, rampup) (reference: utils/utils.py:67-69)."""
    return consistency * sigmoid_rampup(step, consistency_rampup)
