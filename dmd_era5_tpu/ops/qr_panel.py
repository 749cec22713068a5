"""TPU-native QR panel factorization: Pallas Gram kernel + CholQR2.

SURVEY.md section 2b calls for the LAPACK-geqrf replacement that TSQR
builds on.  A literal blocked-Householder panel is the wrong shape for
the MXU — its reflector updates are thin, sequential, VPU-bound work.
The TPU-native panel algorithm is **CholeskyQR2**: factor the panel via
its Gram matrix,

    G = A^T A (one MXU pass over A),  R = chol(G)^T,  Q = A R^-1,

then repeat once to restore orthogonality to machine precision
(CholQR's error scales with cond(A)^2; the second pass squares it away
for cond(A) < ~1e4, which the TSQR combine guarantees for local
blocks after the first level).  Every FLOP lands on the MXU as a large
GEMM or a triangular solve of k x k size; the single pass over A is
HBM-optimal.

The Gram product is a Pallas kernel (one read of A, fp32 accumulation in
VMEM); the triangular solve applies to the small k x k factor and runs
replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gram", "cholqr2", "cholqr"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gram_kernel(a_ref, out_ref, acc_ref, *, n_m: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    blk = a_ref[:]
    acc_ref[:] += jnp.dot(
        blk.T, blk, preferred_element_type=jnp.float32
    )

    @pl.when(i == n_m - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m",))
def gram(a: jax.Array, block_m: int = 1024) -> jax.Array:
    """G = A^T A in one pass over A (M, K) -> (K, K), fp32."""
    m, k = a.shape
    bm = min(block_m, m)
    assert m % bm == 0, (m, bm)
    n_m = m // bm
    return pl.pallas_call(
        functools.partial(_gram_kernel, n_m=n_m),
        grid=(n_m,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((k, k), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * k,
            bytes_accessed=m * k * a.dtype.itemsize + k * k * 4,
            transcendentals=0,
        ),
    )(a)


def _chol_r(g: jax.Array) -> jax.Array:
    """Upper-triangular R with positive diagonal from the Gram matrix,
    regularized so rank-deficient panels stay finite."""
    k = g.shape[0]
    scale = jnp.maximum(jnp.trace(g) / k, 1e-30)
    l = jnp.linalg.cholesky(g + (1e-7 * scale) * jnp.eye(k, dtype=g.dtype))
    return l.T


def cholqr(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Single-pass Cholesky QR: Q = A R^-1, R = chol(A^T A)^T."""
    g = gram(a)
    r = _chol_r(g)
    # Q = A R^-1 via triangular solve on the right: solve R^T X^T = A^T
    q = lax.linalg.triangular_solve(
        r.astype(a.dtype) if a.dtype == jnp.float32 else r,
        a.astype(jnp.float32),
        left_side=False,
        lower=False,
    )
    return q, r


def cholqr2(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """CholeskyQR2: two CholQR passes -> orthonormal Q, R = R2 R1."""
    q1, r1 = cholqr(a)
    q2, r2 = cholqr(q1)
    return q2, jnp.matmul(r2, r1, precision=lax.Precision.HIGHEST)
