"""Parameter freezing utilities (reference: model/base.py:9-55
EncoderDecoder.freeze/unfreeze + config keys freeze_train / unfreeze_itrs,
e.g. config/hpfg_unet_plus_30k_224x224_ACDC.yaml).

In torch this flips requires_grad per parameter; the JAX equivalent is an
optax multi_transform that routes frozen subtrees to zero updates, switchable
on a step threshold inside the jitted step.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def freeze_subtrees(tx: optax.GradientTransformation,
                    params, frozen_keys: Sequence[str]):
    """Wrap ``tx`` so top-level subtrees named in ``frozen_keys`` receive zero
    updates (the torch `requires_grad=False` equivalent)."""
    labels = {k: ("frozen" if k in frozen_keys else "train")
              for k in params.keys()}
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)


def unfreeze_after(tx: optax.GradientTransformation, params,
                   frozen_keys: Sequence[str], unfreeze_itrs: int):
    """Freeze subtrees for the first ``unfreeze_itrs`` steps, then train them
    (reference config: freeze_train + unfreeze_itrs). Implemented as a masked
    update gated on the optimizer step count — one jitted program, no
    recompilation at the switch point."""
    inner = tx

    def init(params_):
        return (inner.init(params_), jnp.zeros((), jnp.int32))

    def update(grads, state, params_=None):
        inner_state, step = state
        updates, inner_state = inner.update(grads, inner_state, params_)
        gate_on = step >= unfreeze_itrs

        def mask_tree(tree):
            out = dict(tree)
            for k in frozen_keys:
                if k in out:
                    out[k] = jax.tree_util.tree_map(
                        lambda u: jnp.where(gate_on, u, jnp.zeros_like(u)),
                        out[k])
            return type(tree)(out) if not isinstance(tree, dict) else out

        return mask_tree(updates), (inner_state, step + 1)

    return optax.GradientTransformation(init, update)
