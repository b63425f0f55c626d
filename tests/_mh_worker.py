"""Multi-host worker: one mean_teacher step on a 2-process x 4-device CPU
mesh (spawned by tests/test_multihost.py; not collected by pytest).

argv: process_id num_processes port devices_per_proc
Prints 'LOSS <float>' on success.
"""

import sys

import jax

pid, nproc, port, ndev = (int(v) for v in sys.argv[1:5])
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)

import numpy as np

from hpfg_tpu.parallel.distributed import (global_batch_from_local,
                                           init_distributed,
                                           is_main_process)

if nproc > 1:
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

import jax.numpy as jnp

from hpfg_tpu.parallel.mesh import make_mesh
from hpfg_tpu.train.algorithms import build_algorithm
from tests.helpers import tiny_cfg

GLOBAL_LABEL, GLOBAL_UNLABEL, HW = 8, 16, 32

cfg = tiny_cfg("unused", batch_size=GLOBAL_LABEL,
               unlabel_batch_size=GLOBAL_UNLABEL)
algo = build_algorithm("mean_teacher", cfg)
state = algo.init_state(jax.random.PRNGKey(0))

# the GLOBAL batch is seeded identically everywhere; each process feeds the
# row-slice owned by its addressable devices (mesh device order = process
# order for jax.devices())
rng = np.random.default_rng(0)
full = {
    "label_img": rng.normal(size=(GLOBAL_LABEL, HW, HW, 1)).astype(np.float32),
    "label": rng.integers(0, 4, (GLOBAL_LABEL, HW, HW)).astype(np.int32),
    "unlabel_img": rng.normal(
        size=(GLOBAL_UNLABEL, HW, HW, 1)).astype(np.float32),
}
local = {k: v[pid * v.shape[0] // nproc:(pid + 1) * v.shape[0] // nproc]
         for k, v in full.items()}

mesh = make_mesh()  # all global devices
with mesh:
    batch = global_batch_from_local(mesh, local)
    step = jax.jit(algo.step, donate_argnums=(0,))
    # AOT-compile BEFORE the barrier: the Gloo context handshake at first
    # execution has a hard ~30 s key-value deadline, and on a loaded 1-core
    # host the two workers' multi-minute XLA compiles skew by more than
    # that. Compilation needs no peer, so finish it first, align at the
    # coordination-service barrier (long timeout, no compile), and only
    # then execute — the handshake sees millisecond skew.
    compiled = step.lower(state, batch).compile()
    if nproc > 1:
        from hpfg_tpu.parallel.distributed import coordination_barrier
        coordination_barrier("mh_post_compile", timeout_s=1800.0)
    state, metrics = compiled(state, batch)
    loss = float(np.asarray(metrics["loss"]))

if is_main_process():
    print(f"LOSS {loss:.10f}", flush=True)
