"""Isolate the stage-1 regression: sweep variants of the pass-1 kernel."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
)

S = 1 << 19
T = 512
R = 128
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


key = jax.random.key(0)
k1, k2 = jax.random.split(key)
dev = jax.devices()[0]
omega = jax.device_put(jax.random.normal(k2, (T, R), jnp.float32), dev)
colw_host = jnp.sum(omega, axis=0, keepdims=True)


def slope_time(fn, reps=2):
    vals = []
    for _ in range(reps):
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

        vals.append((timed(3 * S) - timed(S)) / 2)
    return vals


# variant A: raw y + (m,2) stats + gram of raw y (the sweep winner)
def _kA(x_ref, w_ref, y_ref, st_ref, g_ref):
    i = pl.program_id(0)
    blk = x_ref[:]
    y = jnp.dot(blk, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y
    st_ref[:, 0:1] = jnp.sum(blk, axis=1, keepdims=True)
    st_ref[:, 1:2] = jnp.sum(blk * blk, axis=1, keepdims=True)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    g_ref[:] += lax.dot_general(
        y, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def vA(x, w, bm=512):
    m = x.shape[0]
    return pl.pallas_call(
        _kA,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, T), lambda i: (i, 0)),
            pl.BlockSpec((T, R), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, R), lambda i: (i, 0)),
            pl.BlockSpec((bm, 2), lambda i: (i, 0)),
            pl.BlockSpec((R, R), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, R), jnp.float32),
            jax.ShapeDtypeStruct((m, 2), jnp.float32),
            jax.ShapeDtypeStruct((R, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x, w)


# variant B: A + centered y (epilogue) + gram of centered y
def _kB(x_ref, w_ref, cw_ref, y_ref, st_ref, g_ref, *, inv_t):
    i = pl.program_id(0)
    blk = x_ref[:]
    y = jnp.dot(blk, w_ref[:], preferred_element_type=jnp.float32)
    rs = jnp.sum(blk, axis=1, keepdims=True)
    st_ref[:, 0:1] = rs
    st_ref[:, 1:2] = jnp.sum(blk * blk, axis=1, keepdims=True)
    yc = y - (rs * inv_t) * cw_ref[:]
    y_ref[:] = yc

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    g_ref[:] += lax.dot_general(
        yc, yc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def vB(x, w, bm=512):
    m = x.shape[0]
    return pl.pallas_call(
        functools.partial(_kB, inv_t=1.0 / T),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, T), lambda i: (i, 0)),
            pl.BlockSpec((T, R), lambda i: (0, 0)),
            pl.BlockSpec((1, R), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, R), lambda i: (i, 0)),
            pl.BlockSpec((bm, 2), lambda i: (i, 0)),
            pl.BlockSpec((R, R), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, R), jnp.float32),
            jax.ShapeDtypeStruct((m, 2), jnp.float32),
            jax.ShapeDtypeStruct((R, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x, w, jnp.broadcast_to(colw_host, (1, R)))


# variant C: production sketch_center_gram (two (m,1) stats outputs)
from dmd_era5_tpu.ops.matmul import sketch_center_gram


def vC(x, w):
    return sketch_center_gram(x, w)


for name, fn in [("A raw+gram (sweep winner)", vA), ("B +centering epilogue", vB),
                 ("C production kernel", vC)]:
    for bm in ([512, 1024] if name[0] != "C" else [None]):
        f = fn if bm is None else functools.partial(fn, bm=bm)
        vals = slope_time(f)
        log(f"{name:28s} bm={bm}  " + "  ".join(f"{v*1e3:6.3f}" for v in vals) + " ms")
