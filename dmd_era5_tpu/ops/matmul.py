"""Pallas tiled matmul kernels (MXU-aligned, fp32 accumulation).

The dense building block mandated by the component inventory
(SURVEY.md section 2b, "Pallas matmul kernel"): a block-tiled GEMM with
a VMEM accumulator, bf16-friendly tile shapes, and a fused variant that
applies the row-scaling + rank-1 centering correction of the
standardization chain directly to the GEMM epilogue —

    Y = D^-1 (X - mu 1^T) Omega = D^-1 (X Omega - mu (1^T Omega))

— so preprocessing costs zero extra HBM traffic (see
pipeline/train_step.py for the algebra).

On non-TPU backends the kernels run in interpreter mode (tests); on TPU
they compile via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "matmul",
    "standardized_sketch",
    "sketch_with_stats",
    "cross_project",
]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _matmul_kernel(x_ref, w_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype")
)
def matmul(
    x: jax.Array,
    w: jax.Array,
    block_m: int = 512,
    block_n: int = 128,
    block_k: int = 512,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Tiled (M, K) @ (K, N) -> (M, N) with fp32 VMEM accumulation.

    Dimensions must be divisible by the block sizes (callers pad; the
    snapshot-matrix shapes are padded to the mesh anyway).
    """
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (
        f"shape ({m},{k})x({k},{n}) not divisible by blocks ({bm},{bn},{bk})"
    )
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)
    return pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * x.dtype.itemsize + m * n * 4,
            transcendentals=0,
        ),
    )(x, w)


def _sketch_stats_kernel(
    x_ref, w_ref, y_ref, sum_ref, sumsq_ref, acc_ref, *, n_k: int
):
    """One pass over X: Y += X@W, rowsum += sum(X), rowsumsq += sum(X^2)."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

    blk = x_ref[:]
    acc_ref[:] += jnp.dot(blk, w_ref[:], preferred_element_type=jnp.float32)
    blk32 = blk.astype(jnp.float32)
    sum_ref[:] += jnp.sum(blk32, axis=1, keepdims=True)
    sumsq_ref[:] += jnp.sum(blk32 * blk32, axis=1, keepdims=True)

    @pl.when(kk == n_k - 1)
    def _():
        y_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "block_k"))
def sketch_with_stats(
    x: jax.Array,
    w: jax.Array,
    block_m: int = 1024,
    block_k: int = 512,
):
    """Fused single-pass (Y, rowsum, rowsumsq) = (X@W, X.1, X^2.1).

    The ingest side of the fused fit step: the raw sketch plus the
    centering statistics come from ONE read of X instead of two
    (the rank-1 centering correction is applied downstream, see
    pipeline/train_step.py).

    x: (M, K); w: (K, N).  Returns (Y (M, N) f32, rowsum (M,) f32,
    rowsumsq (M,) f32).
    """
    m, k = x.shape
    _, n = w.shape
    bm, bk = min(block_m, m), min(block_k, k)
    assert m % bm == 0 and k % bk == 0, (m, k, bm, bk)
    n_k = k // bk
    grid = (m // bm, n_k)
    y, s1, s2 = pl.pallas_call(
        functools.partial(_sketch_stats_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, kk: (i, kk)),
            pl.BlockSpec((bk, n), lambda i, kk: (kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i, kk: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, kk: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, kk: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 3 * m * k,
            bytes_accessed=m * k * x.dtype.itemsize + m * n * 4 + 8 * m,
            transcendentals=0,
        ),
    )(x, w)
    return y, s1[:, 0], s2[:, 0]


def _cross_project_kernel(x_ref, y_ref, mu_ref, c_ref, cmu_ref, *, n_m: int):
    """Accumulate C += Y_blk^T X_blk and c_mu += Y_blk^T mu_blk."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)
        cmu_ref[:] = jnp.zeros_like(cmu_ref)

    yt = y_ref[:].T
    c_ref[:] += jnp.dot(yt, x_ref[:], preferred_element_type=jnp.float32)
    cmu_ref[:] += jnp.dot(yt, mu_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i == n_m - 1)
    def _():
        pass  # outputs are the accumulators themselves


@functools.partial(jax.jit, static_argnames=("block_m",))
def cross_project(
    x: jax.Array,
    y: jax.Array,
    mu: jax.Array,
    block_m: int = 1024,
):
    """Fused (C, c_mu) = (Y^T X, Y^T mu) in one pass over X and Y.

    The projection side of the fused fit step: with the sketch basis
    kept as raw Y (never whitened into a materialized Q), the projected
    factor is B = W^T C - (W^T c_mu) 1^T for the small whitening W —
    so the second large pass reads X and Y exactly once and Q never
    exists in HBM.

    x: (M, T); y: (M, r); mu: (M,).  Returns C (r, T), c_mu (r,).
    """
    m, t = x.shape
    _, r = y.shape
    bm = min(block_m, m)
    assert m % bm == 0, (m, bm)
    n_m = m // bm
    mu2 = mu.astype(jnp.float32).reshape(m, 1)
    c, cmu = pl.pallas_call(
        functools.partial(_cross_project_kernel, n_m=n_m),
        grid=(n_m,),
        in_specs=[
            pl.BlockSpec((bm, t), lambda i: (i, 0)),
            pl.BlockSpec((bm, r), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((r, t), lambda i: (0, 0)),
            pl.BlockSpec((r, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, t), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * r * (t + 1),
            bytes_accessed=(m * t + m * r) * x.dtype.itemsize + r * t * 4,
            transcendentals=0,
        ),
    )(x, y, mu2)
    return c, cmu[:, 0]


def _std_sketch_kernel(
    x_ref, w_ref, mu_ref, colw_ref, inv_std_ref, out_ref, acc_ref, *, n_k: int
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        # epilogue: rank-1 centering correction + row scaling
        mu = mu_ref[:]  # (bm, 1)
        colw = colw_ref[:]  # (1, bn)
        inv_std = inv_std_ref[:]  # (bm, 1)
        out_ref[:] = ((acc_ref[:] - mu * colw) * inv_std).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype")
)
def standardized_sketch(
    x: jax.Array,
    w: jax.Array,
    mu: jax.Array,
    inv_std: jax.Array | None = None,
    block_m: int = 512,
    block_n: int = 128,
    block_k: int = 512,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Fused Y = diag(inv_std) (X - mu 1^T) @ W in one pass over X.

    Args:
        x: (M, K) raw snapshot rows.
        w: (K, N) sketch matrix.
        mu: (M,) row means (time means).
        inv_std: (M,) reciprocal row stds, or None for centering only.
    """
    m, k = x.shape
    _, n = w.shape
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0
    n_k = k // bk
    colw = jnp.sum(w.astype(jnp.float32), axis=0, keepdims=True)  # (1, N)
    mu2 = mu.astype(jnp.float32).reshape(m, 1)
    if inv_std is None:
        inv_std = jnp.ones((m,), jnp.float32)
    istd2 = inv_std.astype(jnp.float32).reshape(m, 1)
    grid = (m // bm, n // bn, n_k)
    return pl.pallas_call(
        functools.partial(_std_sketch_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * x.dtype.itemsize + m * n * 4,
            transcendentals=0,
        ),
    )(x, w, mu2, colw, istd2)
