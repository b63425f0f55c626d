"""Marginal-cost probe: true in-program cost of mid-depth stages. (gitignored)

Chains k copies of (a) a raw 3x3 conv, (b) a full ConvBlock (XLA path),
inside ONE jit; the slope (t_k9 - t_k1)/8 is the per-stage device time with
no dispatch floor.
"""
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
SHAPES = [(28, 128), (56, 64), (14, 256), (112, 32)]


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


layers.set_fused_conv(False)
for (hw, ch) in SHAPES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, hw, hw, ch)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, ch, ch)) * 0.02, jnp.bfloat16)

    def conv_chain(k):
        @jax.jit
        def f(x, w):
            for _ in range(k):
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(x.astype(jnp.float32))
        return f

    t1 = timeit(conv_chain(1), x, w)
    t9 = timeit(conv_chain(9), x, w)
    print(f"[{hw}² c{ch}] raw conv marginal {(t9 - t1) / 8:.3f} ms "
          f"(t1={t1:.2f})", flush=True)

    block = layers.ConvBlock(features=ch, dropout_p=0.1, dtype=jnp.bfloat16)
    variables = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    d_rng = jax.random.PRNGKey(2)

    def block_chain(k):
        @jax.jit
        def f(params, stats, x):
            for _ in range(k):
                x, mut = block.apply(
                    {"params": params, "batch_stats": stats}, x, train=True,
                    rngs={"dropout": d_rng}, mutable=["batch_stats"])
            return jnp.sum(x.astype(jnp.float32))
        return f

    t1 = timeit(block_chain(1), variables["params"],
                variables["batch_stats"], x)
    t9 = timeit(block_chain(9), variables["params"],
                variables["batch_stats"], x)
    print(f"[{hw}² c{ch}] ConvBlock(XLA) marginal {(t9 - t1) / 8:.3f} ms "
          f"(t1={t1:.2f})", flush=True)
layers.set_fused_conv(None)
print("done", flush=True)
