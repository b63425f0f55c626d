"""Marginal cost of the mean_teacher loss tail (C=4 minor-dim tensors).
(gitignored)"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.ops.losses import med_sup_loss

LB, UB, HW, C = 8, 24, 224, 4
rng = np.random.default_rng(0)
student = jnp.asarray(rng.normal(size=(LB + UB, HW, HW, C)), jnp.float32)
teacher = jnp.asarray(rng.normal(size=(LB + UB, HW, HW, C)), jnp.float32)
labels = jnp.asarray(rng.integers(0, C, (LB, HW, HW)), jnp.int32)


def tail(s, t, labels):
    s_soft = jax.nn.softmax(s, axis=-1)
    t_soft = jax.lax.stop_gradient(jax.nn.softmax(t, axis=-1))
    return (med_sup_loss(s[:LB], labels, C)
            + 0.1 * jnp.mean((s_soft[LB:] - t_soft[LB:]) ** 2))


def chain(k, with_grad):
    @jax.jit
    def f(s, t, labels):
        total = 0.0
        for i in range(k):
            si = s + jnp.float32(i)  # distinct tensors, defeat CSE
            ti = t + jnp.float32(i)
            if with_grad:
                l, g = jax.value_and_grad(lambda ss: tail(ss, ti, labels))(si)
                total = total + l + jnp.sum(g)
            else:
                total = total + tail(si, ti, labels)
        return total
    return f


def timeit(fn, *args, iters=30):
    for _ in range(3):
        out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


for with_grad in (False, True):
    t1 = timeit(chain(1, with_grad), student, teacher, labels)
    t5 = timeit(chain(5, with_grad), student, teacher, labels)
    print(f"tail grad={with_grad}: marginal {(t5 - t1) / 4:.3f} ms "
          f"(t1={t1:.2f})", flush=True)
print("done", flush=True)
