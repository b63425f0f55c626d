"""Window-attention Pallas A/B on TPU (gitignored; feeds BENCH_NOTES.md)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.models.swinunet import SwinUNet

x = jnp.asarray(np.random.default_rng(0).normal(
    size=(8, 224, 224, 1)), jnp.float32)

results = {}
for use_pallas in (False, True):
    model = SwinUNet(in_channels=1, num_classes=4, dtype=jnp.bfloat16,
                     use_pallas=use_pallas)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    out = None
    for _ in range(3):
        out = fwd(variables, x)
    ref = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fwd(variables, x)
    float(np.asarray(out[0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / 20 * 1000
    results[use_pallas] = (dt, ref)
    print(f"swinunet fwd 8@224 use_pallas={use_pallas}: {dt:.2f} ms",
          flush=True)

a, b = results[False], results[True]
err = float(np.max(np.abs(a[1].astype(np.float32) - b[1].astype(np.float32))))
print(f"speedup: {a[0] / b[0]:.2f}x, max|diff|={err:.4f}", flush=True)
