"""Slope-profile the S-scaling kernels of the fused fit step on TPU.

Times each op at S and 3S rows and reports the marginal cost of
2*S rows (fixed dispatch overhead cancels), plus implied HBM GB/s
against the bytes the op must move.
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

from dmd_era5_tpu.ops.matmul import cross_project, sketch_with_stats

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
R = int(os.environ.get("PROF_R", 110))
K = 100
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope_time(make_fn, make_args, iters=ITERS):
    """marginal seconds for 2*S extra rows -> seconds per S-rows op."""

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


key = jax.random.key(0)
k1, k2, k3 = jax.random.split(key, 3)
dev = jax.devices()[0]
log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
log(f"S={S} T={T} R={R}")


def x_at(rows, dtype=jnp.float32):
    return jax.device_put(jax.random.normal(k1, (rows, T), dtype=dtype), dev)


omega = jax.device_put(jax.random.normal(k2, (T, R), dtype=jnp.float32), dev)
omega_bf = omega.astype(jnp.bfloat16)


def report(name, dt, gbytes):
    log(f"{name:36s} {dt * 1e3:7.3f} ms   {gbytes / dt:7.1f} GB/s implied")


fx = 4 * S * T / 1e9  # GB for one f32 pass over X at S rows
fy = 4 * S * R / 1e9

# 1) plain XLA sketch GEMM f32
dt = slope_time(
    lambda x, om: jnp.matmul(x, om, preferred_element_type=jnp.float32),
    lambda rows: (x_at(rows), omega),
)
report("xla matmul X@Om f32", dt, fx + fy)

# 2) plain XLA sketch GEMM bf16 in, f32 acc
dt = slope_time(
    lambda x, om: jnp.matmul(x, om, preferred_element_type=jnp.float32),
    lambda rows: (x_at(rows, jnp.bfloat16), omega_bf),
)
report("xla matmul X@Om bf16 (bf16 X)", dt, fx / 2 + fy)

# 3) pallas sketch_with_stats f32
dt = slope_time(
    lambda x, om: sketch_with_stats(x, om),
    lambda rows: (x_at(rows), omega),
)
report("pallas sketch_with_stats f32", dt, fx + fy)

# 4) stats alone via XLA (mean + sumsq)
dt = slope_time(
    lambda x: (jnp.mean(x, axis=1), jnp.sum(jnp.square(x), axis=1)),
    lambda rows: (x_at(rows),),
)
report("xla row stats alone f32", dt, fx)

# 5) gram Y^T Y  f32
def y_at(rows):
    return jax.device_put(jax.random.normal(k3, (rows, R), dtype=jnp.float32), dev)


dt = slope_time(
    lambda y: jnp.matmul(y.T, y, preferred_element_type=jnp.float32),
    lambda rows: (y_at(rows),),
)
report("xla gram Y^T Y f32", dt, fy)

# 6) pallas cross_project (reads X and Y)
dt = slope_time(
    lambda x, y, mu: cross_project(x, y, mu),
    lambda rows: (x_at(rows), y_at(rows), jnp.zeros((rows,), jnp.float32)),
)
report("pallas cross_project f32", dt, fx + fy)

# 7) xla cross project C = Y^T X
dt = slope_time(
    lambda x, y: jnp.matmul(y.T, x, preferred_element_type=jnp.float32),
    lambda rows: (x_at(rows), y_at(rows)),
)
report("xla Y^T X f32", dt, fx + fy)

# 8) U lift: Y @ W  (R->K)
w = jax.device_put(jax.random.normal(k3, (R, K), dtype=jnp.float32), dev)
dt = slope_time(
    lambda y, w: jnp.matmul(y, w, preferred_element_type=jnp.float32),
    lambda rows: (y_at(rows), w),
)
report("xla U lift Y@W f32", dt, fy + 4 * S * K / 1e9)

# 9) fused sketch+project in one XLA call on bf16 X: Y and C together
def both(x, om):
    y = jnp.matmul(x, om, preferred_element_type=jnp.float32)
    c = jnp.matmul(y.T, x, preferred_element_type=jnp.float32)
    return y, c


dt = slope_time(both, lambda rows: (x_at(rows, jnp.bfloat16), omega_bf))
report("xla sketch+project bf16 X", dt, fx + fy)
