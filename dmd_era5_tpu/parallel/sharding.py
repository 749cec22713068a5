"""Sharding vocabulary: NamedSharding helpers, padding, resharding.

The NCCL/MPI-equivalent layer of the engine is XLA's collectives driven
by sharding annotations (SURVEY.md section 2b); this module provides the
small typed vocabulary the ops are written against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmd_era5_tpu.parallel.mesh import AXIS_SPACE, AXIS_TIME


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = AXIS_SPACE) -> NamedSharding:
    """(S, T) snapshot matrix with rows split over a mesh axis."""
    return NamedSharding(mesh, P(axis, None))


def col_sharded(mesh: Mesh, axis: str = AXIS_TIME) -> NamedSharding:
    """(S, T) snapshot matrix with columns split over a mesh axis."""
    return NamedSharding(mesh, P(None, axis))


def grid_sharded(mesh: Mesh) -> NamedSharding:
    """(S, T) split over both space and time axes."""
    return NamedSharding(mesh, P(AXIS_SPACE, AXIS_TIME))


def pad_rows_to_multiple(x: jnp.ndarray | np.ndarray, multiple: int):
    """Zero-pad axis 0 to a multiple; returns (padded, original_rows).

    Zero rows are exact no-ops for QR/GEMM-based factorizations (they
    contribute nothing to R or to Gram products), so padding is the
    cheap way to make row counts divide the mesh.
    """
    rows = x.shape[0]
    target = ((rows + multiple - 1) // multiple) * multiple
    if target == rows:
        return x, rows
    pad_width = [(0, target - rows)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad_width) if isinstance(x, jnp.ndarray) else np.pad(x, pad_width)
    return xp, rows


def shard_rows(x, mesh: Mesh, axis: str = AXIS_SPACE):
    """Place a (S, ...) array row-sharded on the mesh, padding as needed.

    Returns (device_array, original_rows).
    """
    n_shards = mesh.shape[axis]
    xp, rows = pad_rows_to_multiple(jnp.asarray(x), n_shards)
    sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
    return jax.device_put(xp, sharding), rows


def reshard(x: jax.Array, sharding: NamedSharding) -> jax.Array:
    """All-to-all reshard (Ulysses-style) between layouts.

    Inside jit this lowers to XLA collective-permute/all-to-all over the
    mesh; outside jit it is an explicit device_put.
    """
    if isinstance(x, jax.core.Tracer):
        return jax.lax.with_sharding_constraint(x, sharding)
    return jax.device_put(x, sharding)
