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

__all__ = ["matmul", "standardized_sketch"]


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
