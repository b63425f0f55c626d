"""Chunk-size sweep for the fused ConvBlock kernels. (gitignored)

Times the flax ConvBlock fused fwd+bwd at the two dominant shapes for
several _CHUNK_BUDGET scalings.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.ops.pallas import conv_block as cb
from hpfg_tpu.models import layers

B = 32
SHAPES = [(224, 224, 16, 16), (112, 112, 16, 32)]
SCALES = [1, 2, 4, 8]


def timeit(fn, *args, iters=20):
    out = None
    for _ in range(3):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


BASE = cb._CHUNK_BUDGET
layers.set_fused_conv(True)
for (h, w, c, f) in SHAPES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, w, c)), jnp.float32)
    block = layers.ConvBlock(features=f, dropout_p=0.1, dtype=jnp.bfloat16)
    variables = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    d_rng = jax.random.PRNGKey(2)
    for scale in SCALES:
        cb._CHUNK_BUDGET = BASE * scale

        def fwdbwd(params, stats, x):
            def loss(p, xx):
                y, _ = block.apply(
                    {"params": p, "batch_stats": stats}, xx, train=True,
                    rngs={"dropout": d_rng}, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return l + sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(g))

        try:
            t = timeit(jax.jit(fwdbwd), variables["params"],
                       variables["batch_stats"], x)
            th = cb._row_chunk(h, w * max(c, f))
            print(f"[{h}² c{c}->f{f}] budget x{scale} (th={th}): {t:.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"[{h}² c{c}->f{f}] budget x{scale} FAILED: "
                  f"{type(e).__name__}: {e}"[:200], flush=True)
cb._CHUNK_BUDGET = BASE
layers.set_fused_conv(None)
print("done", flush=True)
