"""Mock ERA5 backend: shape/coord/physics sanity.

Mirrors the reference tier (tests/test_01_create_mock_data.py per
SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np

from dmd_era5_tpu.snapmat import create_mock_era5, create_mock_era5_svd


def test_grid_shape():
    fs = create_mock_era5(
        "2020-01-01", "2020-01-02", ["temperature"], [1000, 850], seed=0
    )
    t = fs["temperature"]
    assert t.dims == ("time", "level", "latitude", "longitude")
    assert t.sizes["time"] == 25  # inclusive hourly range
    assert t.sizes["level"] == 2
    assert t.sizes["latitude"] == 36
    assert t.sizes["longitude"] == 72
    lats = fs.coord("latitude").values
    lons = fs.coord("longitude").values
    assert lats[0] == 90 and lats[-1] == -85
    assert lons[0] == -180 and lons[-1] == 175


def test_temperature_structure():
    fs = create_mock_era5(
        "2020-01-01", "2020-01-01T06", ["temperature"], [1000, 500], seed=1
    )
    data = fs["temperature"].values
    # Higher altitude (lower pressure) colder before the cos-lat modulation:
    # compare at the equator-most row where the modulation is ~1.
    eq_row = np.argmin(np.abs(fs.coord("latitude").values))
    assert data[:, 1, eq_row, :].mean() < data[:, 0, eq_row, :].mean()
    # Poleward rows scaled down by cos(lat)
    assert np.abs(data[:, :, 0, :]).mean() < np.abs(data[:, :, eq_row, :]).mean()


def test_wind_and_generic_ranges():
    fs = create_mock_era5(
        "2020-01-01",
        "2020-01-01T03",
        ["u_component_of_wind", "v_component_of_wind"],
        [1000],
        seed=2,
    )
    u = fs["u_component_of_wind"].values
    assert u.min() >= -10 and u.max() <= 10
    assert fs["u_component_of_wind"].attrs["units"] == "m/s"


def test_seed_determinism():
    a = create_mock_era5("2020-01-01", "2020-01-01T02", ["temperature"], [1000], seed=7)
    b = create_mock_era5("2020-01-01", "2020-01-01T02", ["temperature"], [1000], seed=7)
    np.testing.assert_array_equal(
        a["temperature"].values, b["temperature"].values
    )


def test_mock_svd_shapes():
    U, s, V, coords, X = create_mock_era5_svd(
        "2020-01-01",
        "2020-01-01T12",
        variables=["temperature"],
        levels=[1000],
        delay_embedding=2,
        n_components=5,
        seed=3,
    )
    n_space = 36 * 72
    t_out = 13 - 1  # 13 hourly snapshots, d=2
    assert U.shape == (n_space * 2, 5)
    assert s.shape == (5,)
    assert V.shape == (5, t_out)
    assert X.shape == (n_space * 2, t_out)
    assert len(coords["time"].values) == t_out
    # Singular values sorted descending
    assert np.all(np.diff(s) <= 0)
    # SVD factors reconstruct the rank-5 projection of X
    np.testing.assert_allclose(
        U @ np.diag(s) @ V,
        U @ U.T @ np.asarray(X.data),
        rtol=1e-8,
        atol=1e-8,
    )
