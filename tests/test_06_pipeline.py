"""Pipeline stages + artifact store: the integration tier.

Mirrors the reference's test_03/test_04/test_05 tiers (SURVEY.md section
4) on the side-effect-free artifact store: mock ingest end-to-end, SVD
stage compute/cache ladder, HDF5 round trips, and version multiplexing.
"""

from __future__ import annotations

import numpy as np
import pytest

from dmd_era5_tpu.pipeline import era5_download, era5_svd
from dmd_era5_tpu.pipeline.artifacts import (
    add_data_to_store,
    file_md5,
    retrieve_data_from_store,
)
from dmd_era5_tpu.snapmat import create_mock_era5, flatten_era5_variables
from dmd_era5_tpu.utils.io_h5 import load_fieldset, save_fieldset
from dmd_era5_tpu.utils.labels import FieldSet


@pytest.fixture()
def dl_config():
    return {
        "source_path": "gs://mock-bucket/era5.zarr",
        "start_datetime": "2019-01-01T00",
        "end_datetime": "2019-01-02T00",
        "delta_time": "1h",
        "variables": "temperature",
        "levels": "1000",
    }


@pytest.fixture()
def svd_stage_config(dl_config):
    return {
        **dl_config,
        "svd_type": "standard",
        "delay_embedding": 2,
        "mean_center": True,
        "scale": False,
        "n_components": 5,
        "save_data_matrix": True,
    }


# ----------------------------------------------------------------- io_h5


def test_h5_roundtrip_dataset():
    fs = create_mock_era5("2020-01-01", "2020-01-01T05", ["temperature"], [1000], seed=0)
    fs.attrs["variables"] = ["temperature"]
    fs.attrs["levels"] = [1000]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/slice.h5"
        save_fieldset(fs, path)
        back = load_fieldset(path)
    assert back.variables == ["temperature"]
    np.testing.assert_array_equal(
        back["temperature"].values, fs["temperature"].values
    )
    np.testing.assert_array_equal(
        back.coord("time").values, fs.coord("time").values
    )
    assert back.attrs["variables"] == ["temperature"]
    assert back["temperature"].dims == ("time", "level", "latitude", "longitude")


def test_h5_string_coords_roundtrip():
    fs = create_mock_era5("2020-01-01", "2020-01-01T03", ["temperature"], [1000], seed=0)
    da = flatten_era5_variables(fs)
    from dmd_era5_tpu.snapmat import space_coord_to_level_lat_lon

    out = space_coord_to_level_lat_lon(FieldSet({"X": da}))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/x.h5"
        save_fieldset(out, path)
        back = load_fieldset(path)
    x = back["X"]
    assert x.coords["original_variable"].values[0] == "temperature"
    np.testing.assert_array_equal(
        x.coords["latitude"].values, out["X"].coords["latitude"].values
    )


def test_h5_layout_is_netcdf4_compatible():
    """Structural check of the netCDF4-on-HDF5 conventions (VERDICT r1
    item 10): root-level variables, dimension scales attached via
    DIMENSION_LIST, hidden scales for coordinate-less dims, CF
    ``coordinates`` listing for auxiliary coords, CF time units —
    everything xarray's h5netcdf/netCDF4 engines need to open the
    artifact unmodified (reference contract: README.md:97-119)."""
    import tempfile

    import h5py

    fs = create_mock_era5(
        "2020-01-01", "2020-01-01T05", ["temperature"], [1000], seed=0
    )
    da = flatten_era5_variables(fs)
    from dmd_era5_tpu.snapmat import space_coord_to_level_lat_lon

    out = space_coord_to_level_lat_lon(FieldSet({"X": da}))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/x.h5"
        save_fieldset(out, path)
        with h5py.File(path, "r") as f:
            # data variable at root, no wrapper groups
            assert "X" in f and isinstance(f["X"], h5py.Dataset)
            assert "vars" not in f and "coords" not in f
            x = f["X"]
            # dims are attached dimension scales (what netCDF4-c writes)
            assert "DIMENSION_LIST" in x.attrs
            assert [s.label or None for s in x.dims] is not None
            time_scale = f["time"]
            assert time_scale.attrs["CLASS"] == b"DIMENSION_SCALE"
            assert x.dims[1][0] == time_scale
            # CF time encoding
            assert (
                time_scale.attrs["units"]
                == "nanoseconds since 1970-01-01"
            )
            assert time_scale.dtype == np.int64
            # aux coords declared CF-style on the data variable
            listed = x.attrs["coordinates"]
            listed = listed.decode() if isinstance(listed, bytes) else listed
            assert "original_variable" in listed.split()
        # and the round trip still reproduces the FieldSet
        back = load_fieldset(path)
        np.testing.assert_array_equal(back["X"].values, out["X"].values)
        assert back["X"].dims == out["X"].dims
        assert (
            back["X"].coords["original_variable"].values[0] == "temperature"
        )

        # a dimension WITHOUT a coordinate variable gets the netCDF
        # hidden-scale marker, and loading does not invent a coord
        from dmd_era5_tpu.utils.labels import Coord, Field

        anon = FieldSet(
            {
                "Y": Field(
                    np.zeros((4, 3), np.float32),
                    ("space", "anon"),
                    {"space": Coord("space", np.arange(4))},
                    name="Y",
                )
            }
        )
        path2 = f"{d}/y.h5"
        save_fieldset(anon, path2)
        with h5py.File(path2, "r") as f:
            assert f["anon"].attrs["NAME"].startswith(
                b"This is a netCDF dimension but not a netCDF variable."
            )
            assert f["Y"].dims[1][0] == f["anon"]
        back2 = load_fieldset(path2)
        assert "anon" not in back2["Y"].coords
        assert back2["Y"].dims == ("space", "anon")


# ------------------------------------------------------------- artifacts


def test_store_add_and_retrieve(tmp_path, dl_config):
    from dmd_era5_tpu.core.config_parser import config_parser

    parsed = config_parser(dl_config, "era5-download")
    fs = create_mock_era5("2019-01-01", "2019-01-01T06", ["temperature"], [1000], seed=0)
    fs.attrs["variables"] = ["temperature"]
    fs.attrs["levels"] = [1000]
    fs.attrs["source_path"] = parsed["source_path"]
    save_fieldset(fs, parsed["save_path"])
    md5 = add_data_to_store(parsed["save_path"], fs.attrs)
    assert md5 == file_md5(parsed["save_path"])

    # delete the workdir copy, retrieve from store
    import os

    os.remove(parsed["save_path"])
    path = retrieve_data_from_store(parsed, "era5_slice")
    assert path.exists()
    back = load_fieldset(path)
    assert back.attrs["variables"] == ["temperature"]


def test_store_no_match_raises(dl_config):
    from dmd_era5_tpu.core.config_parser import config_parser

    parsed = config_parser(dl_config, "era5-download")
    parsed["variables"] = ["v_component_of_wind"]
    with pytest.raises((FileNotFoundError, ValueError)):
        retrieve_data_from_store(parsed, "era5_slice")


def test_store_version_multiplexing(dl_config):
    """Two configs sharing a filename resolve to their own versions —
    the reference's DVC multiplexing behavior (SURVEY.md component 6)."""
    from dmd_era5_tpu.core.config_parser import config_parser

    parsed = config_parser(dl_config, "era5-download")
    for variables in (["temperature"], ["u_component_of_wind"]):
        fs = create_mock_era5("2019-01-01", "2019-01-01T06", variables, [1000], seed=1)
        fs.attrs["variables"] = variables
        fs.attrs["levels"] = [1000]
        fs.attrs["source_path"] = parsed["source_path"]
        save_fieldset(fs, parsed["save_path"])
        add_data_to_store(parsed["save_path"], fs.attrs)

    parsed_t = dict(parsed, variables=["temperature"])
    retrieve_data_from_store(parsed_t, "era5_slice")
    assert load_fieldset(parsed["save_path"]).attrs["variables"] == ["temperature"]

    parsed_u = dict(parsed, variables=["u_component_of_wind"])
    retrieve_data_from_store(parsed_u, "era5_slice")
    assert load_fieldset(parsed["save_path"]).attrs["variables"] == [
        "u_component_of_wind"
    ]


# ------------------------------------------------------------- download


def test_download_mock_end_to_end(dl_config):
    fs = era5_download.download_era5_data(
        era5_download.config_parser(dl_config, "era5-download"),
        use_mock_data=True,
    )
    assert fs.attrs["source_path"] == "mock_data"
    assert fs.sizes["time"] == 25
    assert fs.attrs["hours_delta_time"] == 1.0


def test_download_resample(dl_config):
    dl_config["delta_time"] = "6h"
    fs = era5_download.download_era5_data(
        era5_download.config_parser(dl_config, "era5-download"),
        use_mock_data=True,
    )
    assert fs.sizes["time"] == 5


def test_download_main_with_store(dl_config):
    added, retrieved = era5_download.main(
        dl_config, use_mock_data=True, use_store=True
    )
    assert added or retrieved  # first call adds; reruns retrieve
    added2, retrieved2 = era5_download.main(
        dl_config, use_mock_data=True, use_store=True
    )
    assert retrieved2 and not added2


# ------------------------------------------------------------------ svd


def _stage_slice(svd_cfg) -> None:
    """Put a matching mock slice into the workdir for the SVD stage."""
    from dmd_era5_tpu.core.config_parser import config_parser

    parsed = config_parser(svd_cfg, "era5-svd")
    fs = create_mock_era5(
        parsed["start_datetime"],
        parsed["end_datetime"],
        parsed["variables"],
        parsed["levels"],
        seed=5,
    )
    fs = era5_download.add_config_attributes(fs, parsed)
    save_fieldset(fs, parsed["era5_slice_path"])


def test_svd_stage_end_to_end(svd_stage_config):
    _stage_slice(svd_stage_config)
    results, added, retrieved = era5_svd.main(
        svd_stage_config, write_artifact=True, use_store=False
    )
    assert not added and not retrieved
    n_space = 36 * 72
    d = svd_stage_config["delay_embedding"]
    k = svd_stage_config["n_components"]
    assert results["U"].shape == (n_space * d, k)
    assert results["s"].shape == (k,)
    assert results["V"].shape == (k, 25 - d + 1)
    assert "X" in results and "X_mean" in results
    assert "X_std" not in results
    assert results.attrs["svd_type"] == "standard"
    assert results.attrs["mean_center"] == 1
    # mean was tiled across delay blocks
    assert results["X_mean"].shape == (n_space * d,)
    # space coord was converted for serialization
    np.testing.assert_array_equal(
        results["U"].coords["space"].values, np.arange(n_space * d)
    )

    # singular values match a host SVD of the saved X
    x = results["X"].values
    s_host = np.linalg.svd(x, compute_uv=False)[:k]
    np.testing.assert_allclose(results["s"].values, s_host, rtol=1e-3)


def test_svd_stage_workdir_cache_hit(svd_stage_config):
    _stage_slice(svd_stage_config)
    first, _, _ = era5_svd.main(
        svd_stage_config, write_artifact=True, use_store=False
    )
    second, added, retrieved = era5_svd.main(
        svd_stage_config, write_artifact=True, use_store=False
    )
    assert not added and not retrieved
    np.testing.assert_allclose(
        second["s"].values, first["s"].values, rtol=1e-6
    )


def test_svd_stage_randomized(svd_stage_config):
    svd_stage_config["svd_type"] = "randomized"
    svd_stage_config["save_data_matrix"] = False
    # distinct time range: the workdir cache matcher intentionally
    # ignores svd_type (reference era5_svd.py:178-188), so reusing the
    # previous test's range would hit its cached standard-SVD artifact
    svd_stage_config["start_datetime"] = "2019-03-01T00"
    svd_stage_config["end_datetime"] = "2019-03-02T00"
    _stage_slice(svd_stage_config)
    results, _, _ = era5_svd.main(svd_stage_config, write_artifact=False)
    assert "X" not in results
    assert results["U"].shape[1] == svd_stage_config["n_components"]
    # orthonormal U
    u = results["U"].values
    np.testing.assert_allclose(u.T @ u, np.eye(u.shape[1]), atol=1e-3)


def test_svd_stage_missing_slice_raises(svd_stage_config):
    svd_stage_config["start_datetime"] = "2017-03-01T00"
    svd_stage_config["end_datetime"] = "2017-03-02T00"
    with pytest.raises(Exception, match="Could not retrieve ERA5 slice"):
        era5_svd.main(svd_stage_config)


def test_svd_stage_store_roundtrip(svd_stage_config):
    svd_stage_config["start_datetime"] = "2019-02-01T00"
    svd_stage_config["end_datetime"] = "2019-02-01T12"
    _stage_slice(svd_stage_config)
    results, added, retrieved = era5_svd.main(
        svd_stage_config, write_artifact=True, use_store=True
    )
    assert added and not retrieved
    # remove workdir copy; rerun should retrieve from store without compute
    import os

    os.remove(era5_svd.config_parser(svd_stage_config, "era5-svd")["save_path"])
    results2, added2, retrieved2 = era5_svd.main(
        svd_stage_config, write_artifact=True, use_store=True
    )
    assert retrieved2 and not added2
    np.testing.assert_allclose(
        results2["s"].values, results["s"].values, rtol=1e-6
    )


# -------------------------------------------------------- fault injection


def test_store_missing_object_raises(dl_config):
    """Delete the object behind a log entry -> clean FileNotFoundError
    (the reference's fault-injection pattern, SURVEY.md section 5)."""
    import os

    from dmd_era5_tpu.core.config_parser import config_parser
    from dmd_era5_tpu.core.paths import repo_root

    cfg = dict(dl_config)
    cfg["start_datetime"] = "2019-04-01T00"
    cfg["end_datetime"] = "2019-04-01T12"
    parsed = config_parser(cfg, "era5-download")
    fs = create_mock_era5("2019-04-01", "2019-04-01T12", ["temperature"], [1000], seed=0)
    fs.attrs.update(
        variables=["temperature"], levels=[1000], source_path=parsed["source_path"]
    )
    save_fieldset(fs, parsed["save_path"])
    md5 = add_data_to_store(parsed["save_path"], fs.attrs)
    os.remove(parsed["save_path"])
    os.remove(repo_root() / "store" / "objects" / md5)
    with pytest.raises(FileNotFoundError, match="missing from store"):
        retrieve_data_from_store(parsed, "era5_slice")


def test_corrupt_artifact_fails_loudly(dl_config):
    """A truncated artifact file raises instead of yielding garbage."""
    from dmd_era5_tpu.core.config_parser import config_parser
    from dmd_era5_tpu.utils.io_h5 import load_fieldset

    cfg = dict(dl_config)
    cfg["start_datetime"] = "2019-04-02T00"
    cfg["end_datetime"] = "2019-04-02T12"
    parsed = config_parser(cfg, "era5-download")
    with open(parsed["save_path"], "wb") as f:
        f.write(b"not an hdf5 file")
    with pytest.raises(Exception):
        load_fieldset(parsed["save_path"])


def test_svd_stage_mesh_shape_from_config(svd_stage_config):
    """The stage honors an explicit mesh_shape config field end-to-end."""
    svd_stage_config = dict(svd_stage_config)
    svd_stage_config["start_datetime"] = "2019-10-01T00"
    svd_stage_config["end_datetime"] = "2019-10-01T18"
    svd_stage_config["mesh_shape"] = "space=8"
    _stage_slice(svd_stage_config)
    results, _, _ = era5_svd.main(svd_stage_config, write_artifact=False)
    k = svd_stage_config["n_components"]
    x = results["X"].values
    s_host = np.linalg.svd(x, compute_uv=False)[:k]
    np.testing.assert_allclose(results["s"].values, s_host, rtol=1e-3)
