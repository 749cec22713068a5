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


def bench_tpu(s_rows: int, t_cols: int, k: int, sketch: int, iters: int = 10):
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: reruns skip the multi-minute
    # first-compile on tunneled backends
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
        )
    except Exception:
        pass

    from dmd_era5_tpu.pipeline.train_step import fit_step_fused

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # One-time backend warmup, measured separately: the tunneled axon
    # backend's FIRST compile+execute in a process has been observed to
    # take anywhere from 89 s to 1184 s (r2) regardless of program size
    # — it is tunnel/plugin warmup, not our compile (the very next
    # compile of a DIFFERENT shape takes ~0.4-2 s).  Warm it on a 1x1
    # dot so the timed section reports honest compile numbers.
    t0 = time.perf_counter()
    float(
        jax.jit(lambda a: (a @ a).sum())(
            jax.device_put(jnp.ones((8, 8), jnp.float32), dev)
        ).item()
    )
    warmup_s = time.perf_counter() - t0
    log(f"  backend warmup (1x1 jit): {warmup_s:.1f}s")
    # bf16-RESIDENT X is the headline configuration: the loader/packer
    # path (native/packer.cpp, snapmat/loader.py) already lands bf16 in
    # HBM, so the fit step's two X-reads and three Yc-touches move half
    # the bytes.  The Gram is computed from the stored quantized Yc
    # (ops/matmul.py), keeping the whitening self-consistent; precision
    # parity vs f32 is tested in
    # tests/test_07_train_step.py::test_fit_step_fused_bf16_precision_parity.
    # Set BENCH_DTYPE=float32 for the full-precision measurement.
    gemm_dtype = dict(bfloat16=jnp.bfloat16, float32=jnp.float32)[
        os.environ.get("BENCH_DTYPE", "bfloat16")
    ]

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    omega = jax.device_put(
        jax.random.normal(k2, (t_cols, sketch), dtype=jnp.float32), dev
    )

    # Dispatch overhead through tunneled PJRT backends is tens of ms
    # with ms-scale jitter — comparable to the ~2 ms device step, so a
    # single-dispatch slope can collapse into pure noise (observed
    # 2026-08-21: 30.27 vs 30.84 ms at S vs 3S -> a nonsense 1917
    # Gelem/s headline).  XLA hoists loop-invariant scan bodies and
    # DCEs unconsumed intermediates, so scan amortization is not honest
    # either.  Instead: enqueue K ASYNC dispatches of the full step
    # executable and sync once — each call is a complete executable
    # (every output materialized, nothing hoisted), the device runs
    # them back-to-back, and dispatch jitter divides by K.  The S vs 3S
    # SLOPE then cancels remaining per-call fixed costs exactly.
    # Synchronization is a host value fetch (block_until_ready does not
    # reliably wait through proxied backends; the device executes
    # in-order, so fetching the LAST loss fences all K).
    compile_times = []
    k_steps = int(os.environ.get("BENCH_STEPS_PER_SYNC", 8))

    def timed_at(rows: int) -> float:
        x = jax.device_put(
            jax.random.normal(k1, (rows, t_cols), dtype=jnp.float32).astype(
                gemm_dtype
            ),
            dev,
        )
        step = jax.jit(
            lambda x, om: fit_step_fused(
                x, om, n_components=k, gemm_dtype=gemm_dtype
            )
        )
        t0 = time.perf_counter()
        float(step(x, omega).loss)
        compile_times.append(round(time.perf_counter() - t0, 2))
        log(f"  rows={rows}: compile+first {compile_times[-1]:.1f}s")
        for _ in range(2):
            float(step(x, omega).loss)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = None
            for _ in range(k_steps):
                out = step(x, omega)
            float(out.loss)
            times.append((time.perf_counter() - t0) / k_steps)
        # min is the robust statistic here: tunnel load spikes only ever
        # add time; the median quantifies the in-session spread
        return float(np.min(times)), float(np.median(times))

    t_small, t_small_med = timed_at(s_rows)
    t_large, t_large_med = timed_at(3 * s_rows)
    dt_med = max((t_large_med - t_small_med) / 2, 1e-9)
    # A host load spike during the S measurement can push its median
    # ABOVE 3S's (observed under concurrent synthesis: negative median
    # slope -> a nonsense 2.7e8 Gelem/s value).  The median of a
    # nonnegative-noise statistic can never legitimately beat the min —
    # floor it there so the tracked value degrades to the min-slope
    # instead of exploding (the roofline fence still catches the case
    # where both collapse).
    dt_min_slope = (t_large - t_small) / 2
    if dt_min_slope > 0:
        dt_med = max(dt_med, dt_min_slope)
    bench_tpu.timing_meta = {
        "warmup_s": round(warmup_s, 2),
        "compile_s": compile_times,
    }
    dt = (t_large - t_small) / 2  # seconds per s_rows x t_cols step
    bench_tpu.dt_median = dt_med
    log(
        f"dispatch+step at S: {t_small*1e3:.2f} ms, at 3S: {t_large*1e3:.2f} ms"
    )
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
    # lane-aligned sketch width (multiple of 128): more oversampling than
    # sklearn's k+10 default (strictly better accuracy) AND ~2x faster
    # kernels than a 110-wide sketch on v5e (masked stores on the minor
    # dim cost more than the extra columns)
    sketch = int(os.environ.get("BENCH_SKETCH", 128))
    cpu_rows = int(os.environ.get("BENCH_CPU_S", 1 << 16))

    elems_per_s, flops_per_s, dt = bench_tpu(s_rows, t_cols, k, sketch)
    cpu_elems_per_s, _ = bench_cpu_reference(cpu_rows, t_cols, k)

    meta = getattr(bench_tpu, "timing_meta", {})
    # HEADLINE = median-over-reps (VERDICT r4 item 4): the tunneled
    # backend carries +-25-40% run-to-run variance and load spikes only
    # ever ADD time, so the min-slope is the optimistic corner of the
    # spread — round-over-round comparisons on it are noise.  The min
    # rides along as value_min (the clean-machine capability number).
    value_min = round(elems_per_s / 1e9, 4)
    dt_med = getattr(bench_tpu, "dt_median", dt)
    value = round(s_rows * t_cols / dt_med / 1e9, 4)

    hist_path = os.path.join(os.path.dirname(__file__), "BENCH_HISTORY.json")
    try:
        history = json.load(open(hist_path)) if os.path.exists(hist_path) else []
    except Exception:
        history = []
    import datetime

    # rolling best of the TRACKED (median) statistic across sessions,
    # BEFORE appending this run — the regression reference
    past_medians = [
        h.get("value_median_reps", h.get("value")) for h in history
    ]
    past_medians = [v for v in past_medians if v]
    rolling_best = max(past_medians) if past_medians else None

    # Plausibility fence: the marginal step moves >= 2 bytes/element
    # (two bf16 X reads + the U write), so a single v5e chip cannot
    # exceed ~400 Gelem/s at HBM speed of light.  A slope above 600
    # means the dispatch-jitter collapse (observed 2026-08-21: 1917
    # Gelem/s from a 0.28 ms "slope" buried in 30 ms dispatches) —
    # report it as invalid and keep it OUT of the tracked history.
    roofline_gelem_s = 600.0
    measurement_valid = (
        value <= roofline_gelem_s and value_min <= roofline_gelem_s
    )
    if measurement_valid:
        history.append(
            {
                "date": datetime.datetime.now().isoformat(timespec="seconds"),
                "value": value_min,
                "value_median_reps": value,
            }
        )
        history = history[-50:]
        try:
            with open(hist_path, "w") as f:
                json.dump(history, f, indent=1)
        except Exception:
            pass
    session_medians = [
        h.get("value_median_reps", h.get("value")) for h in history
    ]
    spread = {
        "value_min": value_min,
        "sessions_median": session_medians[-8:],
        "session_min": min(session_medians),
        "session_max": max(session_medians),
    }
    if len(session_medians) >= 3:
        spread["median_sessions"] = round(
            float(np.median(session_medians)), 4
        )

    out = {
        "metric": "snapshot_matrix_fit_throughput",
        "value": value,
        "unit": "Gelements/s",
        "vs_baseline": round(s_rows * t_cols / dt_med / cpu_elems_per_s, 2),
        "spread": spread,
        **meta,
    }
    if not measurement_valid:
        out["invalid_measurement"] = {
            "note": (
                "slope exceeds the single-chip HBM roofline — dispatch "
                "jitter collapsed the S-vs-3S slope; not recorded in "
                "BENCH_HISTORY"
            ),
            "roofline_gelem_s": roofline_gelem_s,
        }
        log("INVALID measurement: slope above HBM roofline; not recorded")
    # regression alarm: median >20% below the rolling best of medians
    if rolling_best is not None and value < 0.8 * rolling_best:
        out["regression"] = {
            "vs_rolling_best": round(value / rolling_best, 3),
            "rolling_best": rolling_best,
            "note": "median-over-reps dropped >20% from the rolling best",
        }
        log(
            f"REGRESSION: median {value} Gelem/s is "
            f"{100 * (1 - value / rolling_best):.0f}% below rolling best "
            f"{rolling_best}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
