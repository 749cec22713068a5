"""Snapshot-matrix transforms: the numerics contract.

Mirrors the reference tier (tests/test_02_slice_tools.py per SURVEY.md
section 4): exact matrices for delay embedding, pointwise flatten
round-trips at sampled (level, lat, lon) sites, delay-coordinate
semantics, and standardize mean-0/std-1 checks.  The delay embedding is
additionally validated against an independent sliding-window-view
construction of the Hankel matrix — the reference's own formulation
(slice_tools.py:182-211).
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pytest
from numpy.lib.stride_tricks import sliding_window_view

from dmd_era5_tpu.snapmat import (
    apply_delay_embedding,
    create_mock_era5,
    delay_embed_np,
    flatten_era5_variables,
    resample_era5_dataset,
    slice_era5_dataset,
    space_coord_to_level_lat_lon,
    standardize_data,
)
from dmd_era5_tpu.utils import FieldSet


@pytest.fixture()
def mock_ds() -> FieldSet:
    return create_mock_era5(
        "2020-01-01",
        "2020-01-02",
        ["temperature", "u_component_of_wind"],
        [1000, 850],
        seed=11,
    )


# -------------------------------------------------------------- slicing


def test_slice_time_and_levels(mock_ds):
    out = slice_era5_dataset(
        mock_ds, "2020-01-01T06", "2020-01-01T12", levels=[850]
    )
    assert out.sizes["time"] == 7
    assert list(out.coord("level").values) == [850]


def test_slice_out_of_bounds(mock_ds):
    with pytest.raises(ValueError, match="outside dataset"):
        slice_era5_dataset(mock_ds, "2019-12-31", "2020-01-01T12")


def test_slice_bad_order(mock_ds):
    with pytest.raises(ValueError, match="before end"):
        slice_era5_dataset(mock_ds, "2020-01-01T12", "2020-01-01T06")


def test_slice_missing_level(mock_ds):
    with pytest.raises(ValueError, match="not available"):
        slice_era5_dataset(mock_ds, levels=[500])


def test_resample_stride(mock_ds):
    out = resample_era5_dataset(mock_ds, timedelta(hours=6))
    assert out.sizes["time"] == 5  # 0,6,12,18,24
    np.testing.assert_array_equal(
        out["temperature"].values, mock_ds["temperature"].values[::6]
    )


# --------------------------------------------------------- standardize


def test_standardize_mean_center_only(mock_ds):
    out, mean, std = standardize_data(mock_ds, scale=False)
    assert std is None
    np.testing.assert_allclose(
        out["temperature"].mean("time").values, 0.0, atol=1e-10
    )
    np.testing.assert_allclose(
        mean["temperature"].values,
        mock_ds["temperature"].values.mean(axis=0),
    )


def test_standardize_scale(mock_ds):
    out, mean, std = standardize_data(mock_ds, scale=True)
    np.testing.assert_allclose(
        out["temperature"].std("time").values, 1.0, atol=1e-10
    )
    assert std is not None


# -------------------------------------------------------------- flatten


def test_flatten_shape_and_order(mock_ds):
    da = flatten_era5_variables(mock_ds)
    n_space = 2 * 36 * 72
    assert da.dims == ("space", "time")
    assert da.shape == (2 * n_space, 25)
    # variable blocks: first block is temperature
    assert da.coords["original_variable"].values[0] == "temperature"
    assert da.coords["original_variable"].values[n_space] == "u_component_of_wind"
    # pointwise round-trip at sampled sites (reference strategy,
    # test_02_slice_tools.py:291-333)
    levels = mock_ds.coord("level").values
    lats = mock_ds.coord("latitude").values
    lons = mock_ds.coord("longitude").values
    rng = np.random.default_rng(0)
    for _ in range(20):
        li = rng.integers(len(levels))
        ai = rng.integers(len(lats))
        oi = rng.integers(len(lons))
        row = li * len(lats) * len(lons) + ai * len(lons) + oi
        np.testing.assert_array_equal(
            da.values[row],
            mock_ds["temperature"].values[:, li, ai, oi],
        )
        assert da.coords["space"].values[row] == (levels[li], lats[ai], lons[oi])


def test_flatten_no_time(mock_ds):
    mean = mock_ds.mean("time")
    da = flatten_era5_variables(mean)
    assert da.dims == ("space",)
    assert da.shape == (2 * 2 * 36 * 72,)


# -------------------------------------------------------- delay embedding


def _reference_hankel(X: np.ndarray, d: int) -> np.ndarray:
    """The reference's own sliding-window construction
    (slice_tools.py:207-211), used as an independent oracle."""
    return (
        sliding_window_view(X.T, (d, X.shape[0]))[:, 0]
        .reshape(X.shape[1] - d + 1, -1)
        .T
    )


@pytest.mark.parametrize("d", [1, 2, 3, 5])
def test_delay_embed_matches_reference_construction(d):
    rng = np.random.default_rng(4)
    X = rng.standard_normal((7, 12))
    np.testing.assert_array_equal(delay_embed_np(X, d), _reference_hankel(X, d))


def test_delay_embed_exact_small():
    X = np.array([[1, 2, 3, 4], [10, 20, 30, 40]], dtype=float)
    out = delay_embed_np(X, 2)
    expected = np.array(
        [
            [1, 2, 3],
            [10, 20, 30],
            [2, 3, 4],
            [20, 30, 40],
        ],
        dtype=float,
    )
    np.testing.assert_array_equal(out, expected)


def test_delay_embed_validation():
    with pytest.raises(ValueError, match="2D"):
        delay_embed_np(np.zeros(3), 2)
    with pytest.raises(ValueError, match="integer greater"):
        delay_embed_np(np.zeros((2, 5)), 0)
    with pytest.raises(ValueError, match="integer greater"):
        delay_embed_np(np.zeros((2, 5)), 1.5)  # type: ignore[arg-type]


def test_apply_delay_embedding_coords(mock_ds):
    da = flatten_era5_variables(mock_ds)
    d = 3
    out = apply_delay_embedding(da, d)
    S = da.sizes["space"]
    assert out.shape == (S * d, 25 - d + 1)
    # delay coord: [d-1]*S, ..., [0]*S  (reference slice_tools.py:265-270)
    delay = out.coords["delay"].values
    np.testing.assert_array_equal(delay[:S], np.full(S, d - 1))
    np.testing.assert_array_equal(delay[-S:], np.zeros(S))
    # time coordinate drops the first d-1 entries
    np.testing.assert_array_equal(
        out.coords["time"].values, da.coords["time"].values[d - 1 :]
    )
    # space and original_variable tiled d times
    assert out.coords["space"].values[0] == out.coords["space"].values[S]
    assert out.attrs["delay_embedding"] == d


def test_apply_delay_embedding_validation(mock_ds):
    da = flatten_era5_variables(mock_ds)
    with pytest.raises(ValueError, match="must be a Field"):
        apply_delay_embedding(da.values, 2)  # type: ignore[arg-type]


# ---------------------------------------------- space coord conversion


def test_space_coord_to_level_lat_lon(mock_ds):
    da = flatten_era5_variables(mock_ds)
    fs = FieldSet({"X": da})
    out = space_coord_to_level_lat_lon(fs)
    x = out["X"]
    np.testing.assert_array_equal(
        x.coords["space"].values, np.arange(x.sizes["space"])
    )
    assert x.coords["level"].values[0] == 1000
    assert x.coords["latitude"].values[0] == 90
    assert x.coords["longitude"].values[0] == -180
    # idempotent on converted data
    again = space_coord_to_level_lat_lon(out)
    np.testing.assert_array_equal(
        again["X"].coords["space"].values, x.coords["space"].values
    )
