"""Variant tuning for the fully-fused pass-1 kernel on real TPU:
(a) current kernel at several block sizes, (b) the pre-fusion
sketch_center_gram for reference, (c) a no-G variant (G derived from C
post-hoc: G = C @ Omega - c_mu colw^T), (d) project-only kernel.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
)

from dmd_era5_tpu.ops.matmul import (
    _dot_precision,
    sketch_center_gram,
    sketch_center_gram_project,
)

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
R = int(os.environ.get("PROF_R", 128))
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


def slope_time(make_fn, iters=ITERS):
    def timed(rows):
        x = x_at(rows)
        fn = jax.jit(make_fn)
        out = fn(x, w_bf)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).item())
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(x, w_bf)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)).item())
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    return (timed(3 * S) - timed(S)) / 2


# ---- (c) no-G kernel: yc, stats, C only; G post-hoc -------------------


def _nog_kernel(x_ref, w_ref, colw_ref, yc_ref, st_ref, c_ref, *, inv_t):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)

    blk = x_ref[:]
    y = jnp.dot(
        blk, w_ref[:],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(blk.dtype, w_ref.dtype),
    )
    blk32 = blk.astype(jnp.float32)
    rs = jnp.sum(blk32, axis=1, keepdims=True)
    st_ref[:, 0:1] = rs
    st_ref[:, 1:2] = jnp.sum(blk32 * blk32, axis=1, keepdims=True)
    yc = (y - (rs * inv_t) * colw_ref[:]).astype(yc_ref.dtype)
    yc_ref[:] = yc
    c_ref[:] += jax.lax.dot_general(
        yc, blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, blk.dtype),
    )


def nog(x, w, bm):
    m, k = x.shape
    n = w.shape[1]
    colw = jnp.sum(w.astype(jnp.float32), axis=0, keepdims=True)
    return pl.pallas_call(
        functools.partial(_nog_kernel, inv_t=1.0 / k),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, 2), lambda i: (i, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), x.dtype),
            jax.ShapeDtypeStruct((m, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x, w, colw)


p1 = (S * T * 2 + S * R * 2 + 8 * S + R * R * 4 + R * T * 4) / 1e9

for bm in (1024, 2048, 4096):
    try:
        dt = slope_time(
            functools.partial(sketch_center_gram_project, block_m=bm, out_dtype=jnp.bfloat16)
        )
        log(f"fused(current) bm={bm}: {dt*1e3:7.3f} ms  {p1/dt:6.1f} GB/s eff")
    except Exception as e:
        log(f"fused(current) bm={bm} FAILED: {type(e).__name__}")

for bm in (1024, 2048, 4096):
    try:
        dt = slope_time(functools.partial(nog, bm=bm))
        log(f"fused(no-G)   bm={bm}: {dt*1e3:7.3f} ms  {p1/dt:6.1f} GB/s eff")
    except Exception as e:
        log(f"fused(no-G)   bm={bm} FAILED: {type(e).__name__}")

for bm in (512, 1024, 2048):
    try:
        dt = slope_time(
            functools.partial(sketch_center_gram, block_m=bm, out_dtype=jnp.bfloat16)
        )
        log(f"old pass1     bm={bm}: {dt*1e3:7.3f} ms  (sketch+gram only)")
    except Exception as e:
        log(f"old pass1     bm={bm} FAILED: {type(e).__name__}")
