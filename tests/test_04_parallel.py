"""Mesh construction, sharding helpers, and collective building blocks."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dmd_era5_tpu.parallel import (
    AXIS_SPACE,
    AXIS_TIME,
    make_mesh,
    parse_mesh_shape,
    shard_rows,
)
from dmd_era5_tpu.parallel.collectives import halo_exchange_left, ring_permute


def test_parse_mesh_shape():
    assert parse_mesh_shape(None) is None
    assert parse_mesh_shape("auto") is None
    assert parse_mesh_shape("space=4,time=2") == {"space": 4, "time": 2}
    with pytest.raises(ValueError, match="Unknown mesh axis"):
        parse_mesh_shape("bogus=2")
    with pytest.raises(ValueError, match=">= 1"):
        parse_mesh_shape("space=0")


def test_make_mesh_auto():
    mesh = make_mesh()
    assert mesh.shape[AXIS_SPACE] == len(jax.devices())
    assert mesh.shape["data"] == 1


def test_make_mesh_explicit():
    mesh = make_mesh("space=4,time=2")
    assert mesh.shape[AXIS_SPACE] == 4
    assert mesh.shape[AXIS_TIME] == 2


def test_make_mesh_bad_shape():
    with pytest.raises(ValueError, match="incompatible|does not cover"):
        make_mesh("space=3")


def test_shard_rows_places_data():
    mesh = make_mesh()
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    xs, rows = shard_rows(x, mesh)
    assert rows == 16
    np.testing.assert_array_equal(np.asarray(xs), x)
    assert xs.sharding.spec == P(AXIS_SPACE, None)


def test_ring_permute():
    mesh = make_mesh("time=8")
    n = mesh.shape[AXIS_TIME]

    def body(x):
        return ring_permute(x, AXIS_TIME, shift=1)

    x = jnp.arange(n, dtype=jnp.float32).reshape(n, 1)
    out = jax.shard_map(
        body, mesh=mesh, in_specs=P(AXIS_TIME, None), out_specs=P(AXIS_TIME, None)
    )(x)
    # block i receives block i-1's value
    expected = np.roll(np.arange(n, dtype=np.float32), 1).reshape(n, 1)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_all_to_all_reshard_space_to_time():
    """Ulysses-style reshard: row-sharded (space) -> column-sharded
    (time) via one all-to-all inside shard_map."""
    from dmd_era5_tpu.parallel.collectives import all_to_all

    mesh = make_mesh("space=8")
    n = 8
    s, t = 16, 24  # divisible by 8
    x = jnp.arange(s * t, dtype=jnp.float32).reshape(s, t)

    def body(x_loc):  # (s/n, t) -> (s, t/n)
        return all_to_all(x_loc, AXIS_SPACE, split_axis=1, concat_axis=0)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(AXIS_SPACE, None),
        out_specs=P(None, AXIS_SPACE),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert out.sharding.spec == P(None, AXIS_SPACE)


def test_reshard_helper_moves_layout():
    from dmd_era5_tpu.parallel import col_sharded, row_sharded, reshard

    mesh = make_mesh()
    x = jnp.arange(64 * 8, dtype=jnp.float32).reshape(64, 8)
    xr = jax.device_put(x, row_sharded(mesh))
    xc = reshard(xr, col_sharded(mesh, axis=AXIS_SPACE))
    np.testing.assert_array_equal(np.asarray(xc), np.asarray(x))
    assert xc.sharding.spec == P(None, AXIS_SPACE)


def test_halo_exchange_left():
    """Each time-shard prepends the left neighbor's last `halo` columns —
    the delay-embedding boundary exchange (SURVEY.md section 5,
    long-context parallelism)."""
    mesh = make_mesh("time=4")
    n = 4
    t_local = 3
    halo = 2

    def body(x):
        return halo_exchange_left(x, AXIS_TIME, halo=halo, axis=1)

    # global (1, 12) row: 0..11 split into 4 time shards of 3 columns
    x = jnp.arange(n * t_local, dtype=jnp.float32).reshape(1, n * t_local)
    out = jax.shard_map(
        body, mesh=mesh, in_specs=P(None, AXIS_TIME), out_specs=P(None, AXIS_TIME)
    )(x)
    out = np.asarray(out).reshape(n, -1, order="A")
    blocks = np.asarray(out).reshape(1, n, t_local + halo)[0]
    # shard 0: zero halo then [0,1,2]
    np.testing.assert_array_equal(blocks[0], [0, 0, 0, 1, 2])
    # shard 1: halo = last 2 of shard 0 => [1,2] then [3,4,5]
    np.testing.assert_array_equal(blocks[1], [1, 2, 3, 4, 5])
    np.testing.assert_array_equal(blocks[3], [7, 8, 9, 10, 11])
