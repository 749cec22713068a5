"""Distributed tall-skinny QR (TSQR) with a tree-reduction combine.

The factorization workhorse replacing LAPACK ``geqrf`` inside the
reference's ``np.linalg.svd`` call (/root/reference/src/dmd_era5/era5_svd/
era5_svd.py:251).  The snapshot matrix is row-sharded over the ``space``
mesh axis; each shard factors its local block, and the small R factors
combine over ICI in a **butterfly ladder** (``ppermute`` exchanges with
partner ``idx XOR 2^level``, log2 P rounds of pairwise stack-and-QR).

Communication and compute per device:

- tree combine:  log2(P) rounds x rk*T floats moved, each round factors
  one (2rk, T) stack — O(log P * T^2) comm, O(log P * T^3) redundant
  flops.  Every device in a merge group computes the *same* stacked
  matrix (lower index always on top), so after the last round R is
  bit-identical everywhere with no broadcast.
- flat combine (fallback for non-power-of-2 axis sizes): one all-gather
  of all P factors, each device re-factors the (P*rk, T) stack —
  O(P * T^2) comm and O(P * T^3) flops, the wrong shape at pod scale.

The global Q is recovered shard-locally: each round contributes a small
(rk, rk') block of the merge Q, accumulated as a *chain product* kept
separate from the tall leaf Q1 so (a) the tall (m_loc, rk) GEMM happens
exactly once at the end, and (b) the chain update of round s is
independent of round s+1's ppermute — XLA overlaps the small GEMM with
the in-flight exchange (SURVEY.md section 7, hard part d).

Deterministic sign convention: every QR is normalized so diag(R) >= 0.
The global reduced QR of a full-column-rank matrix is unique under that
convention, so tree and flat combines agree to roundoff and results are
reproducible across mesh shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dmd_era5_tpu.parallel.mesh import AXIS_SPACE

__all__ = [
    "qr_positive",
    "tsqr",
    "tsqr_orthonormalize",
    "default_qr_method",
]

HIGHEST = lax.Precision.HIGHEST


def qr_positive(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reduced QR with the diag(R) >= 0 sign convention."""
    q, r = jnp.linalg.qr(x, mode="reduced")
    signs = jnp.sign(jnp.diagonal(r))
    signs = jnp.where(signs == 0, 1.0, signs).astype(r.dtype)
    return q * signs[None, :], r * signs[:, None]


def _local_factor(x: jnp.ndarray, method: str):
    """Local tall-skinny factorization for the TSQR leaves.

    "cholqr2" maps onto the MXU (Gram GEMM + small Cholesky; see
    ops.qr_panel) — the TPU default, since XLA's Householder QR lowers
    to a slow sequential sweep there.  "householder" is the
    backward-stable route for ill-conditioned panels: on TPU it runs
    the Pallas blocked-Householder panel kernel when the panel fits its
    VMEM envelope (ops.qr_panel.householder_panel), falling back to
    XLA's QR for larger shapes; on CPU, LAPACK via ``jnp.linalg.qr``.
    """
    if method == "cholqr2":
        from dmd_era5_tpu.ops.qr_panel import cholqr2

        return cholqr2(x)
    if method == "householder" and jax.default_backend() == "tpu":
        m, n = x.shape
        # VMEM envelope of the panel kernel: the (m, n) panel plus two
        # (m, n)-sized scratch buffers must fit in ~16 MB of VMEM.
        if n <= 256 and 3 * m * n * 4 <= 12 * 1024 * 1024:
            from dmd_era5_tpu.ops.qr_panel import householder_panel

            return householder_panel(x)
    return qr_positive(x)


def default_qr_method() -> str:
    return "cholqr2" if jax.default_backend() == "tpu" else "householder"


def _combine_flat(r1: jnp.ndarray, axis_name: str):
    """All-gather combine: returns (chain, R) like :func:`_combine_tree`."""
    rk = r1.shape[0]
    r_all = lax.all_gather(r1, axis_name)  # (P, rk, T)
    n_shards = r_all.shape[0]
    q2, r = qr_positive(r_all.reshape(n_shards * rk, r1.shape[1]))
    idx = lax.axis_index(axis_name)
    chain = lax.dynamic_slice_in_dim(q2, idx * rk, rk, axis=0)
    return chain, r


def _combine_tree(r1: jnp.ndarray, axis_name: str, p: int):
    """Butterfly R combine: log2(p) ppermute rounds of pairwise merges.

    Returns (chain, R): ``chain`` (rk0, rk_final) maps the leaf Q1 onto
    the global Q rows (Q_local = Q1 @ chain); ``R`` (rk_final, T) is
    bit-identical on every shard.  Requires p a power of two.
    """
    idx = lax.axis_index(axis_name)
    t_cols = r1.shape[1]
    r = r1
    chain = None
    stage = 1
    while stage < p:
        rk = r.shape[0]
        perm = [(i, i ^ stage) for i in range(p)]
        r_other = lax.ppermute(r, axis_name, perm)
        am_low = (idx & stage) == 0
        # lower index always on top -> every member of a merge group
        # factors the identical stack, so R stays replicated for free
        top = jnp.where(am_low, r, r_other)
        bot = jnp.where(am_low, r_other, r)
        q2, r = qr_positive(jnp.concatenate([top, bot], axis=0))
        rk_next = min(2 * rk, t_cols)
        my_block = jnp.where(
            am_low, q2[:rk, :rk_next], q2[rk : 2 * rk, :rk_next]
        )
        # chain product stays (rk0, .)-small; independent of the next
        # round's ppermute, so it overlaps with the in-flight exchange
        chain = (
            my_block
            if chain is None
            else jnp.matmul(chain, my_block, precision=HIGHEST)
        )
        stage *= 2
    return chain, r


def _combine(r1: jnp.ndarray, axis_name: str):
    p = lax.axis_size(axis_name)
    if p == 1:
        # nothing to combine: chain is the identity on the leaf rank
        return jnp.eye(r1.shape[0], dtype=r1.dtype), r1
    if p & (p - 1) == 0:
        return _combine_tree(r1, axis_name, p)
    return _combine_flat(r1, axis_name)


def _tsqr_body(x_block: jnp.ndarray, axis_name: str, method: str = "householder"):
    q1, r1 = _local_factor(x_block, method)  # (m_loc, rk), (rk, T)
    chain, r = _combine(r1, axis_name)
    q = jnp.matmul(q1, chain, precision=HIGHEST)
    return q, r


def tsqr_orthonormalize(
    y_block: jnp.ndarray, axis_name: str, method: str
) -> jnp.ndarray:
    """Orthonormalize a row-sharded tall-skinny matrix, Q only.

    The re-orthonormalization primitive of the randomized-SVD power
    iterations: local factor -> tree-reduced R combine -> shard-local
    Q recovery.  For use inside ``shard_map`` bodies.
    """
    q1, r1 = _local_factor(y_block, method)
    chain, _ = _combine(r1, axis_name)
    return jnp.matmul(q1, chain, precision=HIGHEST)


def tsqr(
    x: jax.Array,
    mesh: Mesh | None = None,
    axis_name: str = AXIS_SPACE,
    method: str | None = None,
):
    """QR of a row-sharded tall-skinny matrix.

    Args:
        x: (S, T) matrix, row-sharded over ``axis_name`` when a mesh is
           given (S need not be divisible; the caller pads via
           ``parallel.shard_rows``).
        mesh: device mesh; None (or a size-1 axis) means single-device.

    Returns:
        (Q, R): Q (S, rk) sharded like x, R (rk, T) replicated, with
        rk = min(S_local, T) * ... == min(S, T) when every local block is
        at least as tall as it is wide (the tall-skinny regime).
    """
    method = method or default_qr_method()
    if mesh is None or mesh.shape.get(axis_name, 1) == 1:
        return _local_factor(x, method)

    body = partial(_tsqr_body, axis_name=axis_name, method=method)
    # check_vma=False: R is replicated by construction (every merge
    # group factors the identical stack), but the static varying-axes
    # analysis cannot prove that.
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=(P(axis_name, None), P(None, None)),
        check_vma=False,
    )(x)
