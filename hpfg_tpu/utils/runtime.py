"""Process-level runtime guards shared by the entry points.

bench.py, scripts/tpu_gate.py, scripts/run.py and __graft_entry__.py all
need the same two guards; the round-2/3 incident class behind both lives
here so there is exactly ONE copy:

* the persistent XLA compile cache must NEVER be enabled for CPU compiles —
  XLA:CPU AOT entries reload with mismatched host machine features and
  SIGILL the process (CLAUDE.md). Setting the JAX_COMPILATION_CACHE_DIR env
  var before ``import jax`` silently enables the cache regardless of any
  later ``jax.config.update`` guard (jax reads the env var as the config
  default at import), so entry points must use this helper INSTEAD of the
  env var.
* the dev TPU sits behind a tunnel; when it is down, ``jax.devices()`` /
  the first Execute block forever. Unattended callers (the driver's bench
  run, the recovery chain's gate run) need a fail-fast probe.
"""

from __future__ import annotations

import os


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def enable_persistent_cache(platform: str | None = None) -> bool:
    """Enable the on-disk XLA compile cache (<repo>/.jax_cache) when safe.

    Decision modes:
      * ``platform=None`` — decide from the JAX_PLATFORMS env var, enabling
        only for an EXPLICITLY non-cpu platform string. An unset var may
        resolve to the cpu backend on other hosts, so it stays off; a
        fallback list containing cpu (``"tpu,cpu"``) also stays off. This
        mode never touches a backend, so it is safe before
        ``jax.distributed`` init and before dryrun_multichip's
        virtual-device setup.
      * ``platform='tpu'|'cpu'|...`` — decide from a live backend's
        platform string (callers that already initialized the backend).

    Returns True iff the cache was enabled.
    """
    import jax

    if platform is None:
        plat = os.environ.get("JAX_PLATFORMS", "").lower()
        if not plat or "cpu" in plat:
            return False
    elif platform == "cpu":
        return False
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_root(), ".jax_cache"))
    return True


def require_live_device(tag: str, deadline_s: float | None = None) -> None:
    """Fail fast (clear message, rc=2) instead of hanging forever when the
    accelerator is unreachable — jax.devices()/the first Execute block
    indefinitely on a dead tunnel, which would wedge the driver's bench run
    or the unattended recovery chain.

    The deadline defaults to the HPFG_LIVENESS_S env var (600 s): the first
    Execute after a host reboot has been observed to take >300 s on a cold
    tunnel while the very next process connects in seconds, so a short fixed
    deadline produces false "tunnel down" verdicts."""
    import sys
    import threading

    if deadline_s is None:
        deadline_s = float(os.environ.get("HPFG_LIVENESS_S", "600"))

    import jax.numpy as jnp
    import numpy as np

    ok = threading.Event()

    def probe():
        x = jnp.ones((8, 8))
        float(np.asarray(x @ x)[0, 0])  # compile + execute + readback
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(deadline_s)
    if not ok.is_set():
        print(f"{tag}: no response from the accelerator within "
              f"{deadline_s:.0f}s — backend/tunnel down?", file=sys.stderr)
        os._exit(2)


def dispatch_health(n: int = 5, threshold_s: float = 0.5) -> dict:
    """Measure dispatch+readback latency of a trivial jit and classify the
    tunnel as healthy/degraded (VERDICT r3 #4: a wedged-but-alive tunnel can
    execute at 10-100x normal latency, and a perf probe that records
    whatever it gets cannot distinguish 'tunnel sick' from 'code regressed';
    SUSTAINED_r03c.json was such a 45% phantom regression).

    A healthy round-trip on this setup is ~26 ms per fresh device→host
    transfer (CLAUDE.md); the default 0.5 s median threshold is ~20x that —
    far above noise, far below the wedged-state latencies (>10 s) observed
    in the session-13 outage. Returns {"median_s", "times_s", "healthy"}.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(np.asarray(f(x)))  # compile outside the timed loop
    times = []
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(f(x)))  # fresh array each call -> fresh transfer
        times.append(time.time() - t0)
    med = float(np.median(times))
    return {"median_s": med, "times_s": [round(t, 4) for t in times],
            "healthy": med <= threshold_s}


def require_healthy_dispatch(tag: str, retries: int = 3,
                             retry_wait_s: float = 120.0) -> dict:
    """dispatch_health with retry; refuses (rc=3) when the tunnel stays
    degraded so perf probes report a sick tunnel instead of recording
    bogus numbers."""
    import sys
    import time

    for attempt in range(retries):
        h = dispatch_health()
        if h["healthy"]:
            return h
        print(f"{tag}: dispatch degraded (median {h['median_s']:.2f}s, "
              f"attempt {attempt + 1}/{retries}) — waiting "
              f"{retry_wait_s:.0f}s", file=sys.stderr)
        if attempt < retries - 1:
            time.sleep(retry_wait_s)
    print(f"{tag}: dispatch stayed degraded — refusing to record perf "
          "numbers (re-run when the tunnel recovers)", file=sys.stderr)
    os._exit(3)
