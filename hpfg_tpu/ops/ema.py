"""EMA teacher updates on parameter pytrees.

Reference semantics (utils/utils.py:82-86): per-step
``alpha_eff = min(1 - 1/(step+1), alpha)`` warmup, then
``ema = alpha_eff * ema + (1 - alpha_eff) * param``. In the rebuild the EMA
params live inside the same TrainState pytree and the update happens inside
the jitted train step (one fused elementwise pass over HBM, no host loop over
parameters).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _effective_alpha(alpha: float, step) -> jnp.ndarray:
    step = jnp.asarray(step, jnp.float32)
    return jnp.minimum(1.0 - 1.0 / (step + 1.0), alpha)


def ema_update(params: Any, ema_params: Any, alpha: float, step) -> Any:
    """Full-tree EMA (reference update_ema_variables, utils/utils.py:82-86)."""
    a = _effective_alpha(alpha, step)
    return jax.tree_util.tree_map(
        lambda e, p: a * e + (1.0 - a) * p, ema_params, params)


def ema_update_subtree(params: Any, ema_params: Any, alpha: float, step,
                       keys: tuple[str, ...]) -> Any:
    """EMA only the given top-level subtrees of ``ema_params`` from ``params``.

    The HPFG dual-EMA: model2's encoder/decoder are an EMA of model1's while
    model2's projection necks keep their own gradient-trained weights
    (reference update_ema_variables_backbone, main.py:68-76).
    """
    a = _effective_alpha(alpha, step)
    out = dict(ema_params)
    for key in keys:
        out[key] = jax.tree_util.tree_map(
            lambda e, p: a * e + (1.0 - a) * p, ema_params[key], params[key])
    return type(ema_params)(out) if not isinstance(ema_params, dict) else out
