"""Headline benchmark: snapshot-matrix decomposition throughput.

Runs the flagship fused fit step (standardize -> randomized-sketch SVD
-> reduced DMD operator, pipeline/train_step.py) on the available
accelerator and compares elements/s against the reference engine's
compute path (numpy standardize + sklearn randomized_svd + lstsq DMD on
host CPU — the same libraries the reference delegates to at
/root/reference/src/dmd_era5/era5_svd/era5_svd.py:251,258).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_tpu(s_rows: int, t_cols: int, k: int, sketch: int, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from dmd_era5_tpu.parallel import make_mesh
    from dmd_era5_tpu.pipeline.train_step import fit_step

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    mesh = make_mesh(devices=[dev])
    gemm_dtype = jnp.bfloat16 if dev.platform != "cpu" else jnp.float32

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    x = jax.device_put(
        jax.random.normal(k1, (1, s_rows, t_cols), dtype=jnp.float32), dev
    )
    omega = jax.device_put(
        jax.random.normal(k2, (t_cols, sketch), dtype=jnp.float32), dev
    )

    # Amortize the per-dispatch host<->device round trip (tens of ms on
    # tunneled backends) by scanning n_inner steps inside one jit call.
    n_inner = int(os.environ.get("BENCH_INNER", 8))

    def multi_step(x, om):
        def body(carry, _):
            state = fit_step(
                x, om, mesh=mesh, n_components=k, gemm_dtype=gemm_dtype
            )
            # cheap reductions keep every output live (no DCE of the
            # U-lift GEMM) without materializing n_inner copies of U
            probe = (
                state.loss
                + jnp.sum(state.u) * 1e-20
                + jnp.sum(state.a_red) * 1e-20
            )
            return carry + probe, state.s

        total, s_hist = jax.lax.scan(
            body, jnp.float32(0.0), None, length=n_inner
        )
        return total, s_hist

    import jax.numpy as jnp  # noqa: F811

    step = jax.jit(multi_step)
    # NOTE: synchronization is via a host value fetch (float(...)):
    # block_until_ready does not reliably wait through proxied PJRT
    # backends, and a fetch transfers only a scalar.
    t0 = time.perf_counter()
    total, _ = step(x, omega)
    float(total)
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    for _ in range(2):  # extra warmup: steady-state dispatch
        float(step(x, omega)[0])

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        total, _ = step(x, omega)
        float(total)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_inner
    elements = s_rows * t_cols
    # FLOP model: sketch + project GEMMs (2 * 2*S*T*r) plus the r/k
    # orthonormalization and basis-lift GEMMs.
    flops = 4 * s_rows * t_cols * sketch + s_rows * (
        4 * sketch * sketch + 2 * sketch * k
    )
    log(
        f"tpu fit_step: {dt*1e3:.2f} ms, {elements/dt/1e9:.2f} Gelem/s, "
        f"{flops/dt/1e12:.2f} TFLOP/s (model)"
    )
    return elements / dt, flops / dt, dt


def bench_cpu_reference(s_rows: int, t_cols: int, k: int):
    """The reference compute path on host CPU, per-element throughput."""
    from sklearn.utils.extmath import randomized_svd

    rng = np.random.default_rng(0)
    x = rng.standard_normal((s_rows, t_cols)).astype(np.float32)

    t0 = time.perf_counter()
    xc = x - x.mean(axis=1, keepdims=True)
    u, s, vt = randomized_svd(xc, n_components=k, random_state=0)
    # reduced DMD operator via lstsq on the projected factors
    z = s[:, None] * vt
    a_red, *_ = np.linalg.lstsq(z[:, :-1].T, z[:, 1:].T, rcond=None)
    dt = time.perf_counter() - t0
    elements = s_rows * t_cols
    log(f"cpu reference: {dt*1e3:.2f} ms, {elements/dt/1e9:.3f} Gelem/s")
    return elements / dt, dt


def main():
    s_rows = int(os.environ.get("BENCH_S", 1 << 19))
    t_cols = int(os.environ.get("BENCH_T", 512))
    k = int(os.environ.get("BENCH_K", 100))
    sketch = k + 10
    cpu_rows = int(os.environ.get("BENCH_CPU_S", 1 << 16))

    elems_per_s, flops_per_s, _ = bench_tpu(s_rows, t_cols, k, sketch)
    cpu_elems_per_s, _ = bench_cpu_reference(cpu_rows, t_cols, k)

    print(
        json.dumps(
            {
                "metric": "snapshot_matrix_fit_throughput",
                "value": round(elems_per_s / 1e9, 4),
                "unit": "Gelements/s",
                "vs_baseline": round(elems_per_s / cpu_elems_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
