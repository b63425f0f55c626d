"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual devices (the JAX-native way to
exercise mesh/sharding code without TPU hardware) and a persistent
compilation cache (first-run CPU compiles are slow in this image; cached
reruns are milliseconds).
"""

import os

# Must happen before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
