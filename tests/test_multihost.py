"""Multi-host substrate: 2 processes x 4 virtual CPU devices over a loopback
coordinator compute the SAME mean_teacher loss as one process x 8 devices
(SURVEY.md §5.8; jax.distributed + make_array_from_process_local_data)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers select the CPU backend via jax.config (env vars alone are
    # ignored by this jax build, see conftest.py)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(pid: int, nproc: int, port: int, ndev: int, timeout: int = 600):
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), str(ndev)],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _loss(output: str) -> float:
    for line in output.splitlines():
        if line.startswith("LOSS "):
            return float(line.split()[1])
    raise AssertionError(f"no LOSS line in output:\n{output}")


def test_two_process_loss_matches_single_process():
    port = _free_port()
    procs = [_run(pid, 2, port, 4) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=800)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    loss_mp = _loss(outs[0])

    single = _run(0, 1, port, 8)
    out, _ = single.communicate(timeout=800)
    assert single.returncode == 0, f"single-process worker failed:\n{out}"
    loss_sp = _loss(out)

    # identical global arrays + identical program -> identical loss
    assert loss_mp == pytest.approx(loss_sp, abs=1e-6), (loss_mp, loss_sp)
