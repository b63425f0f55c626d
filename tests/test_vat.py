"""VAT loss: parameter-grad must work when the model runs custom-vjp Pallas
kernels (regression: the power iteration executes the kernels' backward, and
an undetached outer grad would need second-order rules for pltpu.roll)."""

import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models import layers
from hpfg_tpu.ops.vat import vat_loss


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
