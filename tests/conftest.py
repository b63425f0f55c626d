"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual devices (the JAX-native way to
exercise mesh/sharding code without TPU hardware) and a persistent
compilation cache (first-run CPU compiles are slow in this image; cached
reruns are milliseconds).
"""

import os

# The ambient environment pins JAX_PLATFORMS to the TPU plugin and pytest
# plugins may import jax before this conftest runs, so env vars alone are not
# enough — set the jax config directly (backends initialize lazily, so this
# still takes effect). The single TPU chip stays free for bench/driver
# processes while tests run on an 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

assert not jax._src.xla_bridge._backends, \
    "jax backends initialized before conftest could select CPU"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NOTE: no persistent compilation cache here — XLA:CPU AOT cache entries on
# this image load with mismatched machine features and SIGILL. The TPU paths
# (bench.py, __graft_entry__.py) keep their own cache.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_acdc(tmp_path_factory):
    """Tiny ACDC-layout tree shared across the session."""
    from hpfg_tpu.data.synthetic import make_synthetic_acdc

    root = tmp_path_factory.mktemp("acdc")
    return make_synthetic_acdc(str(root), n_train_slices=24, n_test_volumes=2,
                               depth=4, hw=(64, 56))


@pytest.fixture(autouse=True)
def _restore_prng_impl():
    """scripts/run.py sets jax_default_prng_impl='rbg' for training; flax
    init then rejects PRNG keys minted earlier under threefry. Snapshot and
    restore the config around every test."""
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)
