"""Sweep Pallas kernel variants for the fused fit step on real TPU.

Explores: block sizes, lane-aligned sketch width (r=128 vs 110),
gram fused into pass 1, dot_general-without-transpose for pass 2.
Slope-timed (S vs 3S) so dispatch overhead cancels.
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache"),
)

S = int(os.environ.get("PROF_S", 1 << 19))
T = int(os.environ.get("PROF_T", 512))
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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


key = jax.random.key(0)
k1, k2, k3 = jax.random.split(key, 3)
dev = jax.devices()[0]
log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  S={S} T={T}")


def x_at(rows, dtype=jnp.float32):
    return jax.device_put(jax.random.normal(k1, (rows, T), dtype=dtype), dev)


def y_at(rows, r, dtype=jnp.float32):
    return jax.device_put(jax.random.normal(k3, (rows, r), dtype=dtype), dev)


def report(name, dt, gbytes):
    log(f"{name:48s} {dt * 1e3:7.3f} ms   {gbytes / dt:7.1f} GB/s")


fx = 4 * S * T / 1e9

# --- 0) pure-read BW ceiling in pallas: row-sum kernel, big blocks ---


def _rowsum_kernel(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=1, keepdims=True)


def rowsum(x, bm):
    m, t = x.shape
    return pl.pallas_call(
        _rowsum_kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, t), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x)


for bm in (512, 1024, 2048):
    dt = slope_time(
        functools.partial(rowsum, bm=bm), lambda rows: (x_at(rows),)
    )
    report(f"pallas pure-read rowsum bm={bm}", dt, fx)

# --- 1) pass-1 variants: Y = X@W (+ stats + gram fused) ---


def _p1_kernel(x_ref, w_ref, y_ref, stats_ref, gram_ref, *, with_gram):
    i = pl.program_id(0)
    blk = x_ref[:]
    y = jnp.dot(blk, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y
    stats_ref[:, 0:1] = jnp.sum(blk, axis=1, keepdims=True)
    stats_ref[:, 1:2] = jnp.sum(blk * blk, axis=1, keepdims=True)
    if with_gram:
        @pl.when(i == 0)
        def _():
            gram_ref[:] = jnp.zeros_like(gram_ref)

        gram_ref[:] += lax.dot_general(
            y, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def pass1(x, w, bm, with_gram):
    m, t = x.shape
    r = w.shape[1]
    outs = [
        jax.ShapeDtypeStruct((m, r), jnp.float32),
        jax.ShapeDtypeStruct((m, 2), jnp.float32),
        jax.ShapeDtypeStruct((r, r), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_p1_kernel, with_gram=with_gram),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, t), lambda i: (i, 0)),
            pl.BlockSpec((t, r), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, r), lambda i: (i, 0)),
            pl.BlockSpec((bm, 2), lambda i: (i, 0)),
            pl.BlockSpec((r, r), lambda i: (0, 0)),
        ],
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x, w)


for r in (110, 128):
    w = jax.device_put(jax.random.normal(k2, (T, r), jnp.float32), dev)
    for bm in (512, 1024, 2048):
        for wg in (False, True):
            try:
                dt = slope_time(
                    functools.partial(pass1, bm=bm, with_gram=wg),
                    lambda rows: (x_at(rows), w),
                )
                report(
                    f"pallas pass1 r={r} bm={bm} gram={int(wg)}",
                    dt,
                    fx + 4 * S * r / 1e9,
                )
            except Exception as e:
                log(f"pass1 r={r} bm={bm} gram={wg} FAILED: {type(e).__name__}")

# --- 2) pass-2 variants: C = Y^T X via dot_general (no transpose) ---


def _p2_kernel(x_ref, y_ref, c_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)

    c_ref[:] += lax.dot_general(
        y_ref[:], x_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def pass2(x, y, bm):
    m, t = x.shape
    r = y.shape[1]
    return pl.pallas_call(
        _p2_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, t), lambda i: (i, 0)),
            pl.BlockSpec((bm, r), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((r, t), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, t), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x, y)


for r in (110, 128):
    for bm in (512, 1024, 2048):
        try:
            dt = slope_time(
                functools.partial(pass2, bm=bm),
                lambda rows: (x_at(rows), y_at(rows, r)),
            )
            report(f"pallas pass2 dotgen r={r} bm={bm}", dt, fx + 4 * S * r / 1e9)
        except Exception as e:
            log(f"pass2 r={r} bm={bm} FAILED: {type(e).__name__}")

# --- 3) lift variants: U = Y @ W2 (r -> k) ---


def _lift_kernel(y_ref, w_ref, u_ref):
    u_ref[:] = jnp.dot(y_ref[:], w_ref[:], preferred_element_type=jnp.float32)


def lift(y, w2, bm):
    m, r = y.shape
    kk = w2.shape[1]
    return pl.pallas_call(
        _lift_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, r), lambda i: (i, 0)),
            pl.BlockSpec((r, kk), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, kk), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, kk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(y, w2)


for r, kk in ((110, 100), (128, 128)):
    w2 = jax.device_put(jax.random.normal(k2, (r, kk), jnp.float32), dev)
    for bm in (1024, 2048):
        dt = slope_time(
            functools.partial(lift, bm=bm),
            lambda rows: (y_at(rows, r), w2),
        )
        report(
            f"pallas lift r={r} k={kk} bm={bm}",
            dt,
            4 * S * (r + kk) / 1e9,
        )

# --- 4) bf16 X variants for pass1 (halved X read) ---
for r in (128,):
    w = jax.device_put(jax.random.normal(k2, (T, r), jnp.bfloat16), dev)
    for bm in (1024, 2048):
        try:
            dt = slope_time(
                functools.partial(pass1, bm=bm, with_gram=True),
                lambda rows: (x_at(rows, jnp.bfloat16), w),
            )
            report(
                f"pallas pass1 bf16X r={r} bm={bm} gram=1",
                dt,
                fx / 2 + 4 * S * r / 1e9,
            )
        except Exception as e:
            log(f"pass1 bf16 bm={bm} FAILED: {type(e).__name__}: {e}")
