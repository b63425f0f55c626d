"""Virtual Adversarial Training (reference: utils/loss/vatloss.py:57-118).

One power-iteration adversarial perturbation on the model INPUT:
  * clean prediction (detached target)
  * random unit direction d, refined ip times via the gradient of the soft
    dice distance w.r.t. d (the reference zeroes the parameter grads this
    produces, vatloss.py:84-85 — here the inner grad is taken w.r.t. d only
    and wrapped in stop_gradient, same effect)
  * LDS = soft dice between the clean prediction and the prediction at
    x + epi * d — differentiable w.r.t. the model parameters.

BN statistics are NOT tracked during the perturbed passes (the reference's
`_disable_tracking_bn_stats`, vatloss.py:9-17): callers pass an apply_fn
that uses the current batch statistics without mutating them.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _l2_normalize(d: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L2 normalization over all non-batch dims
    (reference vatloss.py:19-23)."""
    flat = d.reshape(d.shape[0], -1)
    norm = jnp.linalg.norm(flat, axis=1).reshape(
        (-1,) + (1,) * (d.ndim - 1))
    return d / (norm + 1e-8)


def soft_dice_probs(probs: jnp.ndarray, target_probs: jnp.ndarray,
                    smooth: float = 1e-10) -> jnp.ndarray:
    """softDiceLoss over probability maps (reference vatloss.py:32-54):
    per class global sums with sum(p^2)/sum(t^2) denominators."""
    p = probs.astype(jnp.float32)
    t = target_probs.astype(jnp.float32)
    axes = tuple(range(p.ndim - 1))
    intersect = jnp.sum(p * t, axis=axes)
    z = jnp.sum(p * p, axis=axes)
    y = jnp.sum(t * t, axis=axes)
    dice = (2.0 * intersect + smooth) / (z + y + smooth)
    return jnp.mean(1.0 - dice)


def binary_dice_probs(probs: jnp.ndarray, target_probs: jnp.ndarray,
                      ep: float = 1e-8) -> jnp.ndarray:
    """Binary_dice_loss over probability maps (reference vatloss.py:25-29):
    ONE global intersection/union over every element — no per-class split,
    sum(p)/sum(t) (not squared) denominators."""
    p = probs.astype(jnp.float32)
    t = target_probs.astype(jnp.float32)
    intersection = 2.0 * jnp.sum(p * t) + ep
    union = jnp.sum(p) + jnp.sum(t) + ep
    return 1.0 - intersection / union


def vat_loss(apply_fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
             rng: jax.Array, xi: float = 10.0, epi: float = 6.0,
             ip: int = 1,
             apply_fn_frozen: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
             distance: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
             = soft_dice_probs,
             ) -> jnp.ndarray:
    """apply_fn(x) -> logits [..., C]; must be differentiable w.r.t. its
    input AND the parameters it closes over, with frozen BN statistics.

    ``apply_fn_frozen``: the same forward with PARAMETER-DETACHED variables
    (tree_map(stop_gradient, variables)); used for the clean target and the
    power iteration. This mirrors the reference's ``zero_grad()`` after the
    inner backward (vatloss.py:84-85) AND keeps the outer parameter grad
    from linearizing through the inner VJP — which matters once the model
    runs custom-vjp Pallas kernels: the inner gradient EXECUTES their
    backward kernels, and differentiating that region again would need
    second-order rules for TPU primitives (pltpu.roll has none). With
    detached parameters the region is constant under the outer grad and JAX
    short-circuits it with symbolic-zero tangents."""
    frozen = apply_fn_frozen if apply_fn_frozen is not None else apply_fn
    pred = jax.lax.stop_gradient(jax.nn.softmax(frozen(x), axis=-1))

    d = jax.random.uniform(rng, x.shape, jnp.float32) - 0.5
    d = _l2_normalize(d)

    def adv_distance(d_):
        p_hat = jax.nn.softmax(frozen(x + xi * d_), axis=-1)
        return distance(p_hat, pred)

    for _ in range(ip):
        grad_d = jax.grad(adv_distance)(d)
        d = jax.lax.stop_gradient(_l2_normalize(grad_d))

    p_hat = jax.nn.softmax(apply_fn(x + epi * d), axis=-1)
    return distance(p_hat, pred)


def vat_loss_3d(apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
                x: jnp.ndarray, rng: jax.Array, xi: float = 10.0,
                epi: float = 6.0, ip: int = 1,
                apply_fn_frozen: Callable[[jnp.ndarray], jnp.ndarray] | None
                = None) -> jnp.ndarray:
    """VAT3d (reference vatloss.py:89-118; unused upstream — SS-Net uses
    VAT2d). Identical power iteration to :func:`vat_loss`; the distance is
    the global ``Binary_dice_loss`` instead of per-class soft dice. The
    reference's 3-D intent is carried by x's shape ([N, D, H, W, 1] here) —
    the math is rank-agnostic (per-sample L2 normalization flattens all
    non-batch dims)."""
    return vat_loss(apply_fn, x, rng, xi=xi, epi=epi, ip=ip,
                    apply_fn_frozen=apply_fn_frozen,
                    distance=binary_dice_probs)
