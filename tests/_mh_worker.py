"""Multi-host worker: one mean_teacher step on a 2-process x 4-device CPU
mesh (spawned by tests/test_multihost.py; not collected by pytest).

argv: process_id num_processes port devices_per_proc [mode]
Prints 'LOSS <float>' on success (mode omitted / 'ok').

Failure-injection modes (VERDICT r4 #8 — exercise the deadline/kill
machinery, not just the happy path). All act AFTER distributed init (the
coordinator requires every process to connect before initialize returns):
  die            exit(3) immediately — a mid-run worker death
  hang           sleep 600 s without ever reaching the barrier
  barrier:<s>    call coordination_barrier('mh_failure_test', timeout_s=s);
                 print 'BARRIER_TIMEOUT <reason>' and exit 0 when the peer
                 never arrives (dead or hung), 'BARRIER_OK' if it does
"""

import os
import sys
import time

import jax

pid, nproc, port, ndev = (int(v) for v in sys.argv[1:5])
mode = sys.argv[5] if len(sys.argv) > 5 else "ok"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)

import numpy as np

from hpfg_tpu.parallel.distributed import (coordination_barrier,
                                           global_batch_from_local,
                                           init_distributed,
                                           is_main_process)

if nproc > 1:
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

if mode == "die":
    sys.exit(3)
elif mode == "hang":
    time.sleep(600)
    sys.exit(4)  # unreachable in tests: the harness kills hung workers
elif mode.startswith("barrier:"):
    timeout_s = float(mode.split(":", 1)[1])
    try:
        coordination_barrier("mh_failure_test", timeout_s=timeout_s)
        print("BARRIER_OK", flush=True)
    except Exception as e:  # noqa: BLE001 — the failure IS the assertion
        print(f"BARRIER_TIMEOUT {type(e).__name__}: {e}", flush=True)
    # _exit: the normal interpreter exit runs jax.distributed's atexit
    # shutdown, which blocks waiting for the HUNG peer to also shut down
    # (observed: survivor timed out the barrier in 20 s, then hung >300 s
    # at exit). The scenario under test ends at the printed verdict.
    sys.stdout.flush()
    os._exit(0)
assert mode == "ok", f"unknown worker mode {mode!r}"

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
