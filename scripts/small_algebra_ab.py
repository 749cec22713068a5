"""A/B the headline step's small-algebra routes on the real chip.

VERDICT r4 item 3: of the 2.42 ms headline step (S=2^19, T=512, r=128,
bf16), pass 1 is 1.006 ms at ~78% MXU peak; the remaining ~1.4 ms is
the U lift (0.53 ms) plus the whitening + small-SVD custom calls
(~0.9 ms).  Candidates measured here, same timing protocol as bench.py
(slope at S and 3S rows, min + median over reps):

  cholqr  — production default: gram_whiten (CholQR2 in r-space:
            safe_cholesky + Newton tri_inv) + jnp.linalg.svd(r, T).
  eigh2   — two r x r eighs + GEMMs; no Cholesky / tri_inv / wide-SVD
            custom calls (pipeline.train_step._reduced_factors).
  hybrid  — CholQR whitener + ONE r x r eigh of B B^T: one spectral
            custom call where cholqr has the (r, T) SVD and eigh2 has
            two eighs.

Prints one JSON line per variant; writes nothing (measurement only —
promote the winner by flipping the fit_step default + re-running
tpu_verify + bench).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
    )
    from dmd_era5_tpu.pipeline.train_step import fit_step_fused

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    s_rows = int(os.environ.get("BENCH_S", 1 << 19))
    t_cols = int(os.environ.get("BENCH_T", 512))
    k = int(os.environ.get("BENCH_K", 100))
    sketch = int(os.environ.get("BENCH_SKETCH", 128))

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    omega = jax.device_put(
        jax.random.normal(k2, (t_cols, sketch), jnp.float32), dev
    )
    # warmup
    float(
        jax.jit(lambda a: (a @ a).sum())(
            jax.device_put(jnp.ones((8, 8), jnp.float32), dev)
        ).item()
    )

    def timed(method: str, rows: int, iters: int = 10):
        x = jax.device_put(
            jax.random.normal(k1, (rows, t_cols), jnp.float32).astype(
                jnp.bfloat16
            ),
            dev,
        )
        step = jax.jit(
            lambda x, om: fit_step_fused(
                x, om, n_components=k, gemm_dtype=jnp.bfloat16,
                small_algebra=method,
            )
        )
        float(step(x, omega).loss)
        for _ in range(2):
            float(step(x, omega).loss)
        times = []
        out = None
        for _ in range(iters):
            t0 = time.perf_counter()
            out = step(x, omega)
            float(out.loss)
            times.append(time.perf_counter() - t0)
        return float(np.min(times)), float(np.median(times)), out

    # numpy oracle for the accuracy check (small rows, exact)
    s_small = 1 << 14
    rng = np.random.default_rng(0)
    x_chk = rng.standard_normal((s_small, t_cols)).astype(np.float32)
    xc = x_chk - x_chk.mean(axis=1, keepdims=True)
    s_ref = np.linalg.svd(xc, compute_uv=False)[:k]

    import jax.numpy as jnp2

    for method in ("cholqr", "eigh2", "hybrid"):
        t_s, t_s_med, _ = timed(method, s_rows)
        t_l, t_l_med, _ = timed(method, 3 * s_rows)
        dt = (t_l - t_s) / 2
        dt_med = max((t_l_med - t_s_med) / 2, 1e-9)
        # accuracy on the small exact check
        chk = fit_step_fused(
            jnp2.asarray(x_chk), jnp2.asarray(np.asarray(omega)),
            n_components=k, small_algebra=method,
        )
        rel = np.max(
            np.abs(np.asarray(chk.s) - s_ref) / s_ref
        )
        print(
            json.dumps(
                {
                    "method": method,
                    "step_ms_min": round(dt * 1e3, 3),
                    "step_ms_median": round(dt_med * 1e3, 3),
                    "gelem_s_min": round(s_rows * t_cols / dt / 1e9, 2),
                    "gelem_s_median": round(
                        s_rows * t_cols / dt_med / 1e9, 2
                    ),
                    "oracle_s_rel_err": float(rel),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
