"""VAT loss: parameter-grad must work when the model runs custom-vjp Pallas
kernels (regression: the power iteration executes the kernels' backward, and
an undetached outer grad would need second-order rules for pltpu.roll)."""

import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models import layers
from hpfg_tpu.ops.vat import binary_dice_probs, vat_loss, vat_loss_3d


def _block_apply(variables, x, rng):
    block = layers.ConvBlock(features=16, dropout_p=0.0, dtype=jnp.float32)
    y, _ = block.apply(variables, x, train=True, rngs={"dropout": rng},
                       mutable=["batch_stats"])
    return y


def test_outer_param_grad_through_vat_with_fused_kernels():
    block = layers.ConvBlock(features=16, dropout_p=0.0, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 16)),
                    jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)
    rng = jax.random.PRNGKey(2)

    layers.set_fused_conv(True)  # interpret-mode Pallas on CPU
    try:
        def loss(params):
            v = {"params": params, "batch_stats": variables["batch_stats"]}
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, v)
            return vat_loss(
                lambda xv: _block_apply(v, xv, rng), x, rng,
                apply_fn_frozen=lambda xv: _block_apply(frozen, xv, rng))

        g = jax.grad(loss)(variables["params"])
    finally:
        layers.set_fused_conv(None)
    # gradient flows to the conv parameters through the perturbed forward
    norms = [float(jnp.linalg.norm(t)) for t in jax.tree_util.tree_leaves(g)]
    assert np.isfinite(norms).all()
    assert max(norms) > 0.0


def test_vat_loss_positive_and_finite():
    block = layers.ConvBlock(features=16, dropout_p=0.0, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 16)),
                    jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)
    rng = jax.random.PRNGKey(3)
    val = float(vat_loss(lambda xv: _block_apply(variables, xv, rng), x, rng))
    assert np.isfinite(val) and 0.0 <= val <= 1.0


def test_binary_dice_matches_reference_formula():
    """binary_dice_probs vs a literal transcription of the reference's
    Binary_dice_loss (vatloss.py:25-29): 1 - (2*sum(p*t)+ep)/(sum p+sum t+ep)."""
    rng = np.random.default_rng(4)
    p = rng.uniform(size=(2, 3, 8, 8, 4)).astype(np.float32)
    t = rng.uniform(size=(2, 3, 8, 8, 4)).astype(np.float32)
    ep = 1e-8
    want = 1.0 - (2.0 * (p * t).sum() + ep) / (p.sum() + t.sum() + ep)
    got = float(binary_dice_probs(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - want) < 1e-6


def test_vat3d_runs_on_volumes_and_grads_flow():
    """VAT3d (reference vatloss.py:89-118): rank-agnostic power iteration on
    a 5-D volume batch with the global binary-dice distance."""
    rng = jax.random.PRNGKey(5)
    w = jax.random.normal(rng, (1, 4)) * 0.5

    def apply_fn(x, w_=None):
        return x * (w_ if w_ is not None else w)  # [N,D,H,W,1] -> broadcast C

    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 3, 8, 8, 1)),
                    jnp.float32)

    def loss(w_):
        frozen = jax.lax.stop_gradient(w_)
        return vat_loss_3d(lambda xv: apply_fn(xv, w_), x, rng,
                           apply_fn_frozen=lambda xv: apply_fn(xv, frozen))

    val, g = jax.value_and_grad(loss)(w)
    assert np.isfinite(float(val)) and 0.0 <= float(val) <= 1.0
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
