"""Marginal cost of fused-Pallas vs XLA ConvBlock at the hot shapes,
fwd and fwd+bwd (chained-k slope method). (gitignored)"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.models import layers

B = 32
SHAPES = [(224, 16), (112, 32)]
K = 5


def timeit(fn, *args, iters=30):
    out = None
    for _ in range(3):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


for (hw, ch) in SHAPES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, hw, hw, ch)), jnp.bfloat16)
    block = layers.ConvBlock(features=ch, dropout_p=0.1, dtype=jnp.bfloat16)
    variables = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    d_rng = jax.random.PRNGKey(2)

    def fwd_chain(k):
        @jax.jit
        def f(params, stats, x):
            for _ in range(k):
                x, _ = block.apply(
                    {"params": params, "batch_stats": stats}, x, train=True,
                    rngs={"dropout": d_rng}, mutable=["batch_stats"])
            return jnp.sum(x.astype(jnp.float32))
        return f

    def bwd_chain(k):
        @jax.jit
        def f(params, stats, x):
            def loss(p, xx):
                for _ in range(k):
                    xx, _ = block.apply(
                        {"params": p, "batch_stats": stats}, xx, train=True,
                        rngs={"dropout": d_rng}, mutable=["batch_stats"])
                return jnp.sum(xx.astype(jnp.float32))

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return l + sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(g))
        return f

    for fused in (False, True):
        layers.set_fused_conv(fused)
        try:
            f1, fk = (timeit(fwd_chain(k), variables["params"],
                             variables["batch_stats"], x) for k in (1, K))
            b1, bk = (timeit(bwd_chain(k), variables["params"],
                             variables["batch_stats"], x) for k in (1, K))
            print(f"[{hw}² c{ch}] fused={fused}: fwd marginal "
                  f"{(fk - f1) / (K - 1):.3f} ms (t1={f1:.2f}) | fwd+bwd "
                  f"marginal {(bk - b1) / (K - 1):.3f} ms (t1={b1:.2f})",
                  flush=True)
        except Exception as e:
            print(f"[{hw}² c{ch}] fused={fused} FAILED: "
                  f"{type(e).__name__}: {e}"[:200], flush=True)
layers.set_fused_conv(None)
print("done", flush=True)
