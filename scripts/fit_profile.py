"""Slope-profile cumulative stages of fit_step_fused on TPU."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
)

from dmd_era5_tpu.ops.matmul import project, sketch_center_gram

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
R = int(os.environ.get("PROF_R", 128))
K = 100
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


key = jax.random.key(0)
k1, k2 = jax.random.split(key)
dev = jax.devices()[0]
omega = jax.device_put(jax.random.normal(k2, (T, R), jnp.float32), dev)


def slope_time(fn):
    def timed(rows):
        x = jax.device_put(
            jax.random.normal(k1, (rows, T), jnp.float32), dev
        )
        jfn = jax.jit(fn)
        out = jfn(x, omega)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).item())
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = jfn(x, omega)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)).item())
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    return (timed(3 * S) - timed(S)) / 2


def stage1(x, om):
    return sketch_center_gram(x, om)


def whiten(gram):
    r_dim = gram.shape[-1]
    scale = jnp.maximum(jnp.trace(gram) / r_dim, 1e-30)
    chol = jnp.linalg.cholesky(
        gram + (1e-6 * scale) * jnp.eye(r_dim, dtype=gram.dtype)
    )
    return lax.linalg.triangular_solve(
        chol, jnp.eye(r_dim, dtype=chol.dtype), lower=True, left_side=True
    )


def stage2(x, om):
    y, s1, s2, g = sketch_center_gram(x, om)
    inv_chol = whiten(g)
    c = project(x, y)
    return c, inv_chol, s1, s2


def stage3(x, om):
    c, inv_chol, s1, s2 = stage2(x, om)
    c_mu = jnp.sum(c, axis=1) / T
    b_small = jnp.matmul(inv_chol, c - c_mu[:, None],
                         preferred_element_type=jnp.float32)
    ub, s, vt = jnp.linalg.svd(b_small, full_matrices=False)
    return ub, s, vt, s1, s2


def stage4(x, om):
    y, s1, s2, g = sketch_center_gram(x, om)
    inv_chol = whiten(g)
    c = project(x, y)
    c_mu = jnp.sum(c, axis=1) / T
    b_small = jnp.matmul(inv_chol, c - c_mu[:, None],
                         preferred_element_type=jnp.float32)
    ub, s, vt = jnp.linalg.svd(b_small, full_matrices=False)
    u = jnp.matmul(
        y,
        jnp.matmul(inv_chol.T, ub[:, :K], preferred_element_type=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return u, s, vt


from dmd_era5_tpu.pipeline.train_step import fit_step_fused


def full(x, om):
    return fit_step_fused(x, om, n_components=K)


prev = 0.0
for name, fn in [
    ("stage1 sketch+gram", stage1),
    ("stage2 +whiten+project", stage2),
    ("stage3 +bsmall+svd", stage3),
    ("stage4 +U lift", stage4),
    ("full fit_step_fused", full),
]:
    dt = slope_time(fn)
    log(f"{name:28s} {dt * 1e3:7.3f} ms  (+{(dt - prev) * 1e3:6.3f})")
    prev = dt
