"""Distributed tall-skinny QR (TSQR).

The factorization workhorse replacing LAPACK ``geqrf`` inside the
reference's ``np.linalg.svd`` call (/root/reference/src/dmd_era5/era5_svd/
era5_svd.py:251).  The snapshot matrix is row-sharded over the ``space``
mesh axis; each shard factors its local block, the small R factors are
all-gathered over ICI and re-factored redundantly on every device, and
the global Q is recovered shard-locally with one small GEMM — a
communication pattern that moves only P * T * T floats regardless of S.

Deterministic sign convention: every QR is normalized so diag(R) >= 0,
making results reproducible across mesh shapes (up to roundoff) and
comparable against host oracles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dmd_era5_tpu.parallel.mesh import AXIS_SPACE

__all__ = ["qr_positive", "tsqr", "default_qr_method"]


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
    backward-stable LAPACK-style route used on CPU and for
    ill-conditioned panels.
    """
    if method == "cholqr2":
        from dmd_era5_tpu.ops.qr_panel import cholqr2

        return cholqr2(x)
    return qr_positive(x)


def default_qr_method() -> str:
    return "cholqr2" if jax.default_backend() == "tpu" else "householder"


def _tsqr_body(x_block: jnp.ndarray, axis_name: str, method: str = "householder"):
    q1, r1 = _local_factor(x_block, method)  # (m_loc, rk), (rk, T)
    rk = r1.shape[0]
    r_all = lax.all_gather(r1, axis_name)  # (P, rk, T)
    n_shards = r_all.shape[0]
    q2, r = qr_positive(r_all.reshape(n_shards * rk, r1.shape[1]))
    idx = lax.axis_index(axis_name)
    my_block = lax.dynamic_slice_in_dim(q2, idx * rk, rk, axis=0)
    q = q1 @ my_block
    return q, r


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
    # check_vma=False: R is computed redundantly (hence replicated) on
    # every shard from the same all-gathered stack, but the static
    # varying-axes analysis cannot prove that.
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=(P(axis_name, None), P(None, None)),
        check_vma=False,
    )(x)
