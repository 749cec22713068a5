"""Native packer + sharded snapshot loader."""

from __future__ import annotations

import numpy as np
import pytest

from dmd_era5_tpu.native import (
    native_available,
    pack_space_time,
    row_stats,
    to_bf16_words,
)
from dmd_era5_tpu.ops import exact_truncated_svd
from dmd_era5_tpu.parallel import make_mesh
from dmd_era5_tpu.snapmat import create_mock_era5, flatten_era5_variables
from dmd_era5_tpu.snapmat.loader import (
    build_snapshot_matrix,
    load_row_sharded,
    packed_info,
    read_packed_rows,
    save_packed_snapshot,
)


def test_native_library_builds():
    assert native_available(), "libpacker.so failed to build (g++ required)"


def test_pack_space_time_matches_transpose(rng):
    x = rng.standard_normal((37, 101)).astype(np.float32)
    out = pack_space_time(x)
    np.testing.assert_array_equal(out, x.T)


def test_pack_space_time_bf16(rng):
    x = rng.standard_normal((16, 64)).astype(np.float32)
    out16 = pack_space_time(x, bf16=True)
    assert out16.dtype == np.uint16
    import jax.numpy as jnp

    back = out16.view(np.dtype(jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(back, x.T, rtol=1e-2, atol=1e-2)


def test_bf16_round_to_nearest_even():
    vals = np.array([1.0, 1.0039062, -2.5, 3.1415926, 1e-38], dtype=np.float32)
    words = to_bf16_words(vals)
    import jax.numpy as jnp

    back = words.view(np.dtype(jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(back, vals, rtol=8e-3, atol=1e-39)


def test_row_stats(rng):
    x = rng.standard_normal((50, 333)).astype(np.float32)
    mean, std = row_stats(x)
    np.testing.assert_allclose(mean, x.mean(axis=1), atol=1e-5)
    np.testing.assert_allclose(std, x.std(axis=1), atol=1e-5)
    _, std1 = row_stats(x, ddof=1)
    np.testing.assert_allclose(std1, x.std(axis=1, ddof=1), atol=1e-5)


def test_build_snapshot_matrix_matches_flatten(rng):
    fs = create_mock_era5(
        "2020-01-01", "2020-01-01T06", ["temperature", "u_component_of_wind"],
        [1000, 850], seed=9,
    )
    x, meta = build_snapshot_matrix(fs)
    da = flatten_era5_variables(fs)
    np.testing.assert_allclose(x, np.asarray(da.data, dtype=np.float32), rtol=1e-6)
    assert meta.n_rows == x.shape[0]
    assert meta.variables == ["temperature", "u_component_of_wind"]


def test_packed_roundtrip(tmp_path, rng):
    fs = create_mock_era5("2020-01-01", "2020-01-01T04", ["temperature"], [1000], seed=1)
    x, meta = build_snapshot_matrix(fs)
    path = tmp_path / "packed.h5"
    save_packed_snapshot(path, x, meta)
    shape, meta2, bf16 = packed_info(path)
    assert shape == x.shape and not bf16
    assert meta2.variables == ["temperature"]
    np.testing.assert_array_equal(read_packed_rows(path, 10, 20), x[10:20])
    np.testing.assert_array_equal(meta2.times, meta.times)


def test_load_row_sharded_from_file(tmp_path, rng):
    mesh = make_mesh()
    x = rng.standard_normal((1003, 24)).astype(np.float32)
    fs = create_mock_era5("2020-01-01", "2020-01-01T23", ["temperature"], [1000], seed=2)
    _, meta = build_snapshot_matrix(fs)
    path = tmp_path / "p.h5"
    save_packed_snapshot(path, x, meta)
    arr, rows = load_row_sharded(path, mesh)
    assert rows == 1003
    assert arr.shape[0] % 8 == 0
    np.testing.assert_allclose(np.asarray(arr)[:1003], x, rtol=1e-6)
    # zero padding beyond original rows
    np.testing.assert_array_equal(np.asarray(arr)[1003:], 0.0)


def test_load_row_sharded_feeds_svd(tmp_path, rng):
    """Packed-file -> sharded load -> distributed SVD == host SVD."""
    mesh = make_mesh()
    s, t = 512, 32
    x = (
        rng.standard_normal((s, 8)) @ rng.standard_normal((8, t))
    ).astype(np.float32)
    fs = create_mock_era5("2020-01-01", "2020-01-01T10", ["temperature"], [1000], seed=3)
    _, meta = build_snapshot_matrix(fs)
    path = tmp_path / "x.h5"
    save_packed_snapshot(path, x, meta)
    arr, rows = load_row_sharded(path, mesh)
    res = exact_truncated_svd(arr, 8, mesh=mesh)
    s_host = np.linalg.svd(x, compute_uv=False)[:8]
    np.testing.assert_allclose(np.asarray(res.s), s_host, rtol=1e-3, atol=1e-3)
