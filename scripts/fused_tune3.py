"""End-to-end breakdown of the fused fit step via DCE variants.

(a) full step          -> pass1 + small algebra + lift
(b) step returning loss only (XLA DCEs the U lift)
(c) pass-1 kernel only (sync on a small stat scalar)

All synced on SCALARS so the measurement adds no S-sized traffic;
slope-timed at S vs 3S.  Also sweeps pass-1 block_m end-to-end.
"""

from __future__ import annotations

import functools
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

from dmd_era5_tpu.ops.matmul import sketch_center_gram_project
from dmd_era5_tpu.pipeline.train_step import fit_step_fused

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
R = int(os.environ.get("PROF_R", 128))
K = int(os.environ.get("PROF_K", 100))
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


key = jax.random.key(0)
k1, k2 = jax.random.split(key)
dev = jax.devices()[0]
log(f"device: {dev.platform} S={S} T={T} r={R}")

w_bf = jax.device_put(
    jax.random.normal(k2, (T, R), jnp.float32).astype(jnp.bfloat16), dev
)


def x_at(rows):
    return jax.device_put(
        jax.random.normal(k1, (rows, T), jnp.float32).astype(jnp.bfloat16), dev
    )


def slope_time(fn):
    def timed(rows):
        x = x_at(rows)
        jfn = jax.jit(fn)
        float(jfn(x, w_bf).item())
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = jfn(x, w_bf)
            float(out.item())
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    return (timed(3 * S) - timed(S)) / 2


def full_step(x, om):
    st = fit_step_fused(x, om, n_components=K, gemm_dtype=jnp.bfloat16)
    # consume U with a cheap scalar so the lift survives DCE
    return st.loss + st.u[0, 0].astype(jnp.float32)


def no_lift(x, om):
    return fit_step_fused(x, om, n_components=K, gemm_dtype=jnp.bfloat16).loss


def pass1_only(x, om, bm=1024):
    _, rs, rss, g, c = sketch_center_gram_project(
        x, om, block_m=bm, out_dtype=jnp.bfloat16
    )
    return jnp.sum(rss) + g[0, 0] + c[0, 0]


dt_a = slope_time(full_step)
log(f"(a) full step          : {dt_a*1e3:7.3f} ms  {S*T/dt_a/1e9:6.1f} Gelem/s")
dt_b = slope_time(no_lift)
log(f"(b) no lift (loss only): {dt_b*1e3:7.3f} ms   lift = {(dt_a-dt_b)*1e3:.3f} ms")
for bm in (512, 1024, 2048):
    dt_c = slope_time(functools.partial(pass1_only, bm=bm))
    log(f"(c) pass1 only bm={bm:4d} : {dt_c*1e3:7.3f} ms")
