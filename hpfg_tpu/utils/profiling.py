"""Profiling / tracing utilities (SURVEY §5.1).

The reference's only performance tooling is offline thop FLOPs counting in
model __main__ blocks (e.g. model/unet.py:209-214) and cudnn.benchmark=True.
Here tracing is a first-class utility: jax.profiler traces viewable in
TensorBoard/Perfetto, device-memory stats, and a step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a profiler trace for the enclosed block
    (view with TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory statistics where the backend exposes them."""
    stats = {}
    for d in jax.local_devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:  # backend without memory_stats
            stats[str(d)] = {}
    return stats


class StepTimer:
    """Rolling images/sec + ms/step meter for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def ms_per_step(self) -> float:
        if not self._times:
            return float("nan")
        return 1000.0 * sum(self._times) / len(self._times)

    def images_per_sec(self, batch_size: int) -> float:
        ms = self.ms_per_step
        return batch_size / (ms / 1000.0) if ms == ms else float("nan")


def count_flops(fn, *args) -> float:
    """Static FLOP estimate via XLA cost analysis (replacement for the
    reference's thop probes)."""
    compiled = jax.jit(fn).lower(*args).compile()
    return compiled_flops(compiled)


def compiled_flops(compiled) -> float:
    """FLOPs of an already-lowered-and-compiled executable (avoids a second
    trace when the caller benches the same program)."""
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    if analysis is None:
        return float("nan")
    return float(analysis.get("flops", float("nan")))


# Peak dense-matmul throughput per chip in FLOP/s (bf16 inputs, fp32
# accumulate — the compute dtype everywhere in this repo). Public spec
# numbers; keys are jax Device.device_kind strings.
_PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def chip_peak_flops(device=None) -> float | None:
    """bf16 peak FLOP/s for ``device`` (default: devices()[0]), or None when
    the chip kind is unknown (e.g. CPU test runs)."""
    d = device if device is not None else jax.devices()[0]
    return _PEAK_BF16_FLOPS.get(getattr(d, "device_kind", ""))


def mfu(flops_per_step: float, step_seconds: float,
        device=None) -> float | None:
    """Model-FLOPs utilization: achieved FLOP/s over the chip's bf16 peak
    (VERDICT r4 #4). ``flops_per_step`` is the XLA cost-analysis count of
    the full compiled step (fwd+bwd+optimizer), so this is an upper bound
    on textbook MFU (which counts only ideal model FLOPs) but is auditable
    from the program actually executed. Returns None off-TPU."""
    peak = chip_peak_flops(device)
    if peak is None or not (flops_per_step == flops_per_step) \
            or step_seconds <= 0:
        return None
    return flops_per_step / step_seconds / peak
