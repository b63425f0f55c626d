"""A/B the real flax ConvBlock (fused Pallas vs XLA dispatch) at UNet
stage shapes. (gitignored)"""
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
SHAPES = [  # (h, w, c, f) — mid-depth UNet stages currently on XLA
    (56, 56, 32, 64),
    (28, 28, 64, 128),
    (56, 56, 128, 64),
    (112, 112, 16, 32),  # sanity: an already-fused stage
]


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


for (h, w, c, f) in SHAPES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, w, c)), jnp.float32)
    block = layers.ConvBlock(features=f, dropout_p=0.1, dtype=jnp.bfloat16)
    variables = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    d_rng = jax.random.PRNGKey(2)
    res = {}
    for fused in (True, False):
        layers.set_fused_conv(fused)

        @jax.jit
        def fwd(params, stats, x):
            y, mut = block.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                rngs={"dropout": d_rng}, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        @jax.jit
        def fwdbwd(params, stats, x):
            def loss(p, xx):
                y, _ = block.apply(
                    {"params": p, "batch_stats": stats}, xx, train=True,
                    rngs={"dropout": d_rng}, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            # force the backward to materialize (a discarded g is DCE'd!)
            return l + sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(g))

        try:
            tf = timeit(fwd, variables["params"], variables["batch_stats"], x)
            tb = timeit(fwdbwd, variables["params"], variables["batch_stats"], x)
            res[fused] = (tf, tb)
            print(f"[{h}x{w} c{c}->f{f}] fused={fused}: fwd {tf:.2f} "
                  f"fwd+bwd {tb:.2f}", flush=True)
        except Exception as e:
            print(f"[{h}x{w} c{c}->f{f}] fused={fused} FAILED: "
                  f"{type(e).__name__}: {e}"[:300], flush=True)
    layers.set_fused_conv(None)
    if True in res and False in res:
        print(f"  -> speedup fwd {res[False][0]/res[True][0]:.2f}x "
              f"fwd+bwd {res[False][1]/res[True][1]:.2f}x", flush=True)
print("done", flush=True)
