"""Tracing, timing, and roofline counters.

The reference has no profiling at all (SURVEY.md section 5); this module
supplies the observability layer the TPU build needs: profiler trace
capture (TensorBoard/Perfetto via jax.profiler), steady-state timing
with value-fetch synchronization (``block_until_ready`` does not
reliably synchronize through proxied PJRT backends — measured in this
repo's bench bring-up), and roofline utilization against per-platform
peak numbers.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "trace",
    "measure",
    "DevicePeaks",
    "device_peaks",
    "roofline",
    "throughput",
]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(value) -> None:
    """Force completion by fetching one scalar to host."""
    leaf = jax.tree_util.tree_leaves(value)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def measure(
    fn: Callable,
    *args,
    iters: int = 5,
    warmup: int = 2,
) -> float:
    """Median steady-state seconds per call of a jitted function."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@dataclass(frozen=True)
class DevicePeaks:
    """Peak compute/bandwidth for roofline accounting."""

    name: str
    bf16_flops: float  # FLOP/s
    f32_flops: float
    hbm_bw: float  # bytes/s


_PEAKS = {
    "TPU v5 lite": DevicePeaks("TPU v5e", 394e12, 197e12, 819e9),
    "TPU v5e": DevicePeaks("TPU v5e", 394e12, 197e12, 819e9),
    "TPU v5p": DevicePeaks("TPU v5p", 459e12, 229e12, 2765e9),
    "TPU v4": DevicePeaks("TPU v4", 275e12, 137e12, 1228e9),
    "TPU v6 lite": DevicePeaks("TPU v6e", 918e12, 459e12, 1640e9),
}
_CPU_FALLBACK = DevicePeaks("cpu", 1e11, 5e10, 5e10)


def device_peaks(device=None) -> DevicePeaks:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    return _PEAKS.get(kind, _CPU_FALLBACK)


def roofline(
    flops: float,
    bytes_accessed: float,
    seconds: float,
    device=None,
    dtype: str = "bf16",
) -> dict:
    """Achieved fraction of compute and bandwidth peaks."""
    peaks = device_peaks(device)
    peak_flops = peaks.bf16_flops if dtype == "bf16" else peaks.f32_flops
    achieved_flops = flops / seconds
    achieved_bw = bytes_accessed / seconds
    return {
        "device": peaks.name,
        "seconds": seconds,
        "tflops": achieved_flops / 1e12,
        "flops_util": achieved_flops / peak_flops,
        "gbps": achieved_bw / 1e9,
        "bw_util": achieved_bw / peaks.hbm_bw,
        "bound": "compute"
        if achieved_flops / peak_flops > achieved_bw / peaks.hbm_bw
        else "memory",
    }


def throughput(elements: int, seconds: float) -> dict:
    """Snapshot-matrix elements/s — the north-star scaling metric."""
    return {
        "elements": elements,
        "seconds": seconds,
        "elements_per_s": elements / seconds,
        "gelements_per_s": elements / seconds / 1e9,
    }
