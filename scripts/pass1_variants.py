"""Pass-1 kernel variant sweep: where do the non-DMA microseconds go?

At S=2^19, T=512, r=128 bf16 the fused pass-1 kernel runs ~1.9 ms =
7.4 us/block (bm=2048): HBM DMA is ~2.4 us and the three MXU dots ~3 us,
so ~40% of the block time is unexplained — hypothesis: the VPU epilogue
(bf16->f32 convert, square, two lane reductions for the row stats)
serializes with the MXU.  Variants isolate it:

  A: production kernel (stats in-kernel), bm sweep
  B: stats REMOVED (lower bound: pure sketch+gram+project)
  C: stats removed in-kernel + a separate fused XLA stats pass
     (re-reads X once: +2 bytes/elem of HBM)
  D: stats via MXU — square in bf16 on the VPU, then both reductions
     as ONE extra dot against a (k, 128) matrix [ones | zeros]

Run on the TPU; slope-timed at S and 3S, scalar-synced.
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
)

from dmd_era5_tpu.ops.matmul import (
    _dot_precision,
    sketch_center_gram_project,
)

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
R = int(os.environ.get("PROF_R", 128))
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


key = jax.random.key(0)
k1, k2 = jax.random.split(key)
dev = jax.devices()[0]
log(f"device: {dev.platform} S={S} T={T} r={R}")

w_bf = jax.device_put(
    jax.random.normal(k2, (T, R), jnp.float32).astype(jnp.bfloat16), dev
)


def make_x(rows):
    return jax.device_put(
        jax.random.normal(k1, (rows, T), jnp.float32).astype(jnp.bfloat16),
        dev,
    )


def slope_time(fn):
    outs = {}

    def timed(rows):
        x = make_x(rows)
        f = jax.jit(fn)
        float(np.asarray(f(x, w_bf)).ravel()[0])
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            float(np.asarray(f(x, w_bf)).ravel()[0])
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    return (timed(3 * S) - timed(S)) / 2


# ---- variant B: no stats at all --------------------------------------
def _kernel_nostats(x_ref, w_ref, colw_ref, yc_ref, g_ref, c_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    blk = x_ref[:]
    y = jnp.dot(
        blk, w_ref[:],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(blk.dtype, w_ref.dtype),
    )
    yc = y.astype(yc_ref.dtype)
    yc_ref[:] = yc
    g_ref[:] += jax.lax.dot_general(
        yc, yc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, yc.dtype),
    )
    c_ref[:] += jax.lax.dot_general(
        yc, blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, blk.dtype),
    )


def pass1_nostats(x, w, bm=2048):
    m, k = x.shape
    _, n = w.shape
    colw = jnp.sum(w.astype(jnp.float32), axis=0, keepdims=True)
    yc, g, c = pl.pallas_call(
        _kernel_nostats,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
    )(x, w, colw)
    return yc, g, c


# ---- variant D: stats via one extra MXU dot ---------------------------
def _kernel_mxustats(x_ref, w_ref, colw_ref, ones_ref, yc_ref, st_ref, g_ref, c_ref, *, inv_t):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    blk = x_ref[:]
    y = jnp.dot(
        blk, w_ref[:],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(blk.dtype, w_ref.dtype),
    )
    # row stats on the MXU: [sum x, sum x^2] = [x, x*x] @ [1 | 1]
    # (ones in cols 0 and 1; square stays in bf16 on the VPU)
    sq = (blk * blk).astype(blk.dtype)
    st = jnp.dot(
        blk, ones_ref[:],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(blk.dtype, ones_ref.dtype),
    )
    st2 = jnp.dot(
        sq, ones_ref[:],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(sq.dtype, ones_ref.dtype),
    )
    rs = st[:, 0:1]
    st_ref[:, 0:1] = rs
    st_ref[:, 1:2] = st2[:, 0:1]
    yc = (y - (rs * inv_t) * colw_ref[:]).astype(yc_ref.dtype)
    yc_ref[:] = yc
    g_ref[:] += jax.lax.dot_general(
        yc, yc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, yc.dtype),
    )
    c_ref[:] += jax.lax.dot_general(
        yc, blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, blk.dtype),
    )


def pass1_mxustats(x, w, bm=2048):
    m, k = x.shape
    _, n = w.shape
    colw = jnp.sum(w.astype(jnp.float32), axis=0, keepdims=True)
    ones = jnp.zeros((k, 128), jnp.bfloat16).at[:, 0].set(1.0)
    yc, st, g, c = pl.pallas_call(
        functools.partial(_kernel_mxustats, inv_t=1.0 / k),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((k, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, 2), lambda i: (i, 0)),
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((m, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
    )(x, w, colw, ones)
    return yc, st, g, c


# ---- variant E: rowsum free from a ones sketch column ------------------
def _kernel_statscol(x_ref, w_ref, colw_ref, yc_ref, st_ref, g_ref, c_ref, *, inv_t):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    blk = x_ref[:]
    y = jnp.dot(
        blk, w_ref[:],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(blk.dtype, w_ref.dtype),
    )
    rs = y[:, -1:]  # last sketch column is ones: y[:, -1] = rowsum(X)
    st_ref[:, 0:1] = rs
    sq = blk * blk  # bf16 square; f32 accumulation in the reduce
    st_ref[:, 1:2] = jnp.sum(sq, axis=1, keepdims=True, dtype=jnp.float32)
    yc = (y - (rs * inv_t) * colw_ref[:]).astype(yc_ref.dtype)
    yc_ref[:] = yc
    g_ref[:] += jax.lax.dot_general(
        yc, yc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, yc.dtype),
    )
    c_ref[:] += jax.lax.dot_general(
        yc, blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(yc.dtype, blk.dtype),
    )


def pass1_statscol(x, w, bm=2048):
    m, k = x.shape
    _, n = w.shape
    w = w.at[:, -1].set(1.0)
    colw = jnp.sum(w.astype(jnp.float32), axis=0, keepdims=True)
    yc, st, g, c = pl.pallas_call(
        functools.partial(_kernel_statscol, inv_t=1.0 / k),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, 2), lambda i: (i, 0)),
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((m, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
    )(x, w, colw)
    return yc, st, g, c


def main():
    def prod(bm):
        def f(x, w):
            yc, rs, rss, g, c = sketch_center_gram_project(
                x, w, block_m=bm, out_dtype=jnp.bfloat16
            )
            return jnp.sum(rss) + g[0, 0] + c[0, 0]
        return f

    for bm in (1024, 2048, 4096):
        try:
            dt = slope_time(prod(bm))
            log(f"A prod bm={bm:5d}: {dt*1e3:7.3f} ms  {S*T/dt/1e9:6.1f} Gelem/s")
        except Exception as e:
            log(f"A prod bm={bm:5d}: FAILED {type(e).__name__}: {str(e)[:120]}")

    for bm in (2048, 4096):
        try:
            def f(x, w, bm=bm):
                yc, g, c = pass1_nostats(x, w, bm=bm)
                return g[0, 0] + c[0, 0]
            dt = slope_time(f)
            log(f"B nostats bm={bm:4d}: {dt*1e3:7.3f} ms  {S*T/dt/1e9:6.1f} Gelem/s")
        except Exception as e:
            log(f"B nostats bm={bm:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")

    for bm in (2048, 4096):
        try:
            def f(x, w, bm=bm):
                yc, g, c = pass1_nostats(x, w, bm=bm)
                x32 = x.astype(jnp.float32)
                rs = jnp.sum(x32, axis=1)
                rss = jnp.sum(x32 * x32, axis=1)
                return g[0, 0] + c[0, 0] + jnp.sum(rss) + jnp.sum(rs)
            dt = slope_time(f)
            log(f"C xla-stats bm={bm:2d}: {dt*1e3:7.3f} ms  {S*T/dt/1e9:6.1f} Gelem/s")
        except Exception as e:
            log(f"C xla-stats bm={bm:2d}: FAILED {type(e).__name__}: {str(e)[:120]}")

    for bm in (2048, 4096):
        try:
            def f(x, w, bm=bm):
                yc, st, g, c = pass1_mxustats(x, w, bm=bm)
                return jnp.sum(st[:, 1]) + g[0, 0] + c[0, 0]
            dt = slope_time(f)
            log(f"D mxu-stats bm={bm:2d}: {dt*1e3:7.3f} ms  {S*T/dt/1e9:6.1f} Gelem/s")
        except Exception as e:
            log(f"D mxu-stats bm={bm:2d}: FAILED {type(e).__name__}: {str(e)[:120]}")

    for bm in (1024, 2048, 4096):
        try:
            def f(x, w, bm=bm):
                yc, st, g, c = pass1_statscol(x, w, bm=bm)
                return jnp.sum(st[:, 1]) + st[0, 0] + g[0, 0] + c[0, 0]
            dt = slope_time(f)
            log(f"E statscol bm={bm:4d}: {dt*1e3:7.3f} ms  {S*T/dt/1e9:6.1f} Gelem/s")
        except Exception as e:
            log(f"E statscol bm={bm:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")

    # numeric sanity of E vs numpy
    x = make_x(1 << 14)
    yc, st, g, c = jax.jit(pass1_statscol)(x, w_bf)
    xn = np.asarray(x, dtype=np.float32)
    rs_ref = xn.sum(axis=1)
    rss_ref = (xn * xn).sum(axis=1)
    log(
        "E sanity: rs err %.2e rss err %.2e yc[:, -1] max %.2e"
        % (
            np.abs(np.asarray(st[:, 0]) - rs_ref).max()
            / max(1e-9, np.abs(rs_ref).max()),
            np.abs(np.asarray(st[:, 1]) - rss_ref).max()
            / max(1e-9, np.abs(rss_ref).max()),
            np.abs(np.asarray(yc[:, -1], dtype=np.float32)).max(),
        )
    )


if __name__ == "__main__":
    main()
