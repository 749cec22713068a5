"""A/B the headline fit step: stats_from_sketch on/off, u_dtype f32/bf16.

End-to-end slope timing (S vs 3S), many reps, interleaved A/B per size
so tunnel drift hits both arms equally.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
)

from dmd_era5_tpu.pipeline.train_step import fit_step_fused

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
R = int(os.environ.get("PROF_R", 128))
K = int(os.environ.get("PROF_K", 100))
ITERS = int(os.environ.get("PROF_ITERS", 20))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


key = jax.random.key(0)
k1, k2 = jax.random.split(key)
dev = jax.devices()[0]
log(f"device: {dev.platform} S={S} T={T} r={R} iters={ITERS}")

omega = jax.device_put(jax.random.normal(k2, (T, R), jnp.float32), dev)

VARIANTS = {
    "plain      ": dict(stats_from_sketch=False),
    "statscol   ": dict(stats_from_sketch=True),
    "statscol+u16": dict(stats_from_sketch=True, u_dtype=jnp.bfloat16),
}


def main():
    fns = {
        name: jax.jit(
            lambda x, om, kw=kw: fit_step_fused(
                x, om, n_components=K, gemm_dtype=jnp.bfloat16, **kw
            ).loss
        )
        for name, kw in VARIANTS.items()
    }
    times = {name: {} for name in fns}
    for rows in (S, 3 * S):
        x = jax.device_put(
            jax.random.normal(k1, (rows, T), jnp.float32).astype(jnp.bfloat16),
            dev,
        )
        for name, f in fns.items():
            float(f(x, omega))  # compile
        samples = {name: [] for name in fns}
        for _ in range(ITERS):
            for name, f in fns.items():  # interleave
                t0 = time.perf_counter()
                float(f(x, omega))
                samples[name].append(time.perf_counter() - t0)
        for name in fns:
            times[name][rows] = float(np.min(samples[name]))
    for name in fns:
        dt = (times[name][3 * S] - times[name][S]) / 2
        log(
            f"{name}: {dt*1e3:7.3f} ms  {S*T/dt/1e9:6.1f} Gelem/s "
            f"(S {times[name][S]*1e3:.2f} / 3S {times[name][3*S]*1e3:.2f})"
        )


if __name__ == "__main__":
    main()
