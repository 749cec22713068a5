"""Tune the fully-fused pass-1 kernel (sketch_center_gram_project) and
the end-to-end fused fit step on real TPU.

Slope-timed (S vs 3S rows) so tunnel dispatch overhead cancels.
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
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


key = jax.random.key(0)
k1, k2 = jax.random.split(key)
dev = jax.devices()[0]
log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  S={S} T={T} r={R}")


def slope_time(make_fn, make_args, iters=ITERS):
    def timed(rows):
        args = make_args(rows)
        fn = jax.jit(make_fn)
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).item())
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)).item())
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    return (timed(3 * S) - timed(S)) / 2


def x_at(rows, dtype):
    return jax.device_put(
        jax.random.normal(k1, (rows, T), jnp.float32).astype(dtype), dev
    )


def report(name, dt, gbytes):
    log(f"{name:52s} {dt * 1e3:7.3f} ms   {gbytes / dt:7.1f} GB/s eff")


for dtype, nb in ((jnp.bfloat16, 2), (jnp.float32, 4)):
    w = jax.device_put(
        jax.random.normal(k2, (T, R), jnp.float32).astype(dtype), dev
    )
    p1_bytes = (S * T * nb + S * R * nb + 8 * S + R * R * 4 + R * T * 4) / 1e9
    for bm in (256, 512, 1024, 2048):
        try:
            dt = slope_time(
                functools.partial(
                    sketch_center_gram_project, block_m=bm, out_dtype=dtype
                ),
                lambda rows: (x_at(rows, dtype), w),
            )
            report(f"fused pass1 {jnp.dtype(dtype).name} bm={bm}", dt, p1_bytes)
        except Exception as e:
            log(f"fused pass1 {jnp.dtype(dtype).name} bm={bm} FAILED: {type(e).__name__}: {e}")

# end-to-end step, u f32 vs bf16
for dtype, nb in ((jnp.bfloat16, 2),):
    w = jax.device_put(
        jax.random.normal(k2, (T, R), jnp.float32).astype(dtype), dev
    )
    for u_dtype, ub in ((None, 4), (jnp.bfloat16, 2)):
        tot = (
            S * T * nb          # X read (pass 1)
            + 2 * S * R * nb    # Yc write + read (lift)
            + S * K * ub        # U write
        ) / 1e9
        dt = slope_time(
            functools.partial(
                fit_step_fused, n_components=K, gemm_dtype=dtype, u_dtype=u_dtype
            ),
            lambda rows: (x_at(rows, dtype), w),
        )
        uname = "f32" if u_dtype is None else "bf16"
        elem = S * T / dt / 1e9
        report(f"fit_step_fused bf16 u={uname}", dt, tot)
        log(f"    -> {elem:.1f} Gelem/s")
