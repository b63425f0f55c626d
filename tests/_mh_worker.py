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
    if nproc > 1:
        # Align the processes BEFORE the first collective: under full-suite
        # load on a small host the workers' startup/compile phases serialize,
        # and the first process to execute a collective times out (~30 s)
        # in the Gloo context handshake waiting for the straggler (r2 flake).
        # The coordination-service barrier (long timeout, no compile) closes
        # the startup skew; the tiny sync_global_devices all-reduce then
        # creates the Gloo context while the skew is milliseconds, so the
        # real step below reuses an already-established context.
        from hpfg_tpu.parallel.distributed import (coordination_barrier,
                                                   sync_global_devices)
        coordination_barrier("mh_warmup", timeout_s=1800.0)
        sync_global_devices("mh_gloo_warmup")
    state, metrics = step(state, batch)
    loss = float(np.asarray(metrics["loss"]))

if is_main_process():
    print(f"LOSS {loss:.10f}", flush=True)
