"""Config reader + parser validation matrix.

Mirrors the reference test strategy for components 1-3 (SURVEY.md section 4:
tests/test_00_config_reader.py, tests/test_00_config_parser.py).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from dmd_era5_tpu.core import config_parser, config_reader
from dmd_era5_tpu.core.constants import (
    ERA5_PRESSURE_LEVEL_VARIABLES,
    ERA5_PRESSURE_LEVELS,
)

# ---------------------------------------------------------------- reader


def test_config_reader_types(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[era5-download]\n"
        'source_path = "gs://bucket/x.zarr"\n'
        "n = 2\n"
        "flag = True\n"
        'delta = "1h"\n'
    )
    cfg = config_reader("era5-download", ini)
    assert cfg["source_path"] == "gs://bucket/x.zarr"
    assert cfg["n"] == 2 and isinstance(cfg["n"], int)
    assert cfg["flag"] is True
    assert cfg["delta"] == "1h"


def test_config_reader_missing_section(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text("[era5-download]\nx = 1\n")
    with pytest.raises(Exception, match="not found"):
        config_reader("era5-svd", ini)


def test_config_reader_bad_value(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text("[era5-download]\nx = not_a_literal\n")
    with pytest.raises(Exception):
        config_reader("era5-download", ini)


# ---------------------------------------------------------------- parser


def test_parser_happy_path(download_config):
    parsed = config_parser(download_config, "era5-download")
    assert parsed["start_datetime"] == datetime(2019, 1, 1, 0)
    assert parsed["end_datetime"] == datetime(2019, 1, 2, 0)
    assert parsed["delta_time"] == timedelta(hours=1)
    assert parsed["variables"] == ["temperature"]
    assert parsed["levels"] == [1000]
    assert parsed["save_name"] == "2019-01-01T00_2019-01-02T00_1h.h5"
    assert parsed["save_path"].endswith(
        "data/era5_download/2019-01-01T00_2019-01-02T00_1h.h5"
    )


def test_parser_bad_section(download_config):
    with pytest.raises(ValueError, match="not currently supported"):
        config_parser(download_config, "era5-nope")


@pytest.mark.parametrize("field", ["source_path", "start_datetime", "levels"])
def test_parser_missing_field(download_config, field):
    del download_config[field]
    with pytest.raises(ValueError, match=f"Missing required field.*{field}"):
        config_parser(download_config, "era5-download")


def test_parser_bad_datetime(download_config):
    download_config["start_datetime"] = "not-a-date"
    with pytest.raises(ValueError, match="Invalid datetime"):
        config_parser(download_config, "era5-download")


@pytest.mark.parametrize(
    "spec,expected",
    [
        ("1h", timedelta(hours=1)),
        ("6h", timedelta(hours=6)),
        ("1d", timedelta(days=1)),
        ("2w", timedelta(weeks=2)),
        ("1m", timedelta(days=30)),
        ("1y", timedelta(days=365)),
    ],
)
def test_parser_delta_time_grammar(download_config, spec, expected):
    download_config["delta_time"] = spec
    download_config["end_datetime"] = "2021-01-01T00"
    download_config["start_datetime"] = "2019-01-01T00"
    parsed = config_parser(download_config, "era5-download")
    assert parsed["delta_time"] == expected


@pytest.mark.parametrize("spec", ["1x", "h", "x", "", "1.5h"])
def test_parser_bad_delta_time(download_config, spec):
    download_config["delta_time"] = spec
    with pytest.raises(ValueError):
        config_parser(download_config, "era5-download")


def test_parser_end_before_start(download_config):
    download_config["end_datetime"] = "2018-01-01T00"
    with pytest.raises(ValueError, match="after start"):
        config_parser(download_config, "era5-download")


def test_parser_range_shorter_than_delta(download_config):
    download_config["delta_time"] = "2d"
    with pytest.raises(ValueError, match="at least as long"):
        config_parser(download_config, "era5-download")


def test_parser_future_start(download_config):
    download_config["start_datetime"] = "2100-01-01T00"
    download_config["end_datetime"] = "2100-01-02T00"
    with pytest.raises(ValueError, match="future"):
        config_parser(download_config, "era5-download")


def test_parser_all_pressure_level_vars(download_config):
    download_config["variables"] = "all_pressure_level_vars"
    parsed = config_parser(download_config, "era5-download")
    assert sorted(parsed["variables"]) == sorted(ERA5_PRESSURE_LEVEL_VARIABLES)


def test_parser_variable_list(download_config):
    download_config["variables"] = "temperature, u_component_of_wind"
    parsed = config_parser(download_config, "era5-download")
    assert parsed["variables"] == ["temperature", "u_component_of_wind"]


@pytest.mark.parametrize(
    "bad", ["2m_temperature", "all_single_level_vars", "nonexistent_var"]
)
def test_parser_bad_variables(download_config, bad):
    download_config["variables"] = bad
    with pytest.raises(ValueError):
        config_parser(download_config, "era5-download")


def test_parser_all_levels(download_config):
    download_config["levels"] = "all"
    parsed = config_parser(download_config, "era5-download")
    assert sorted(parsed["levels"]) == sorted(ERA5_PRESSURE_LEVELS)


def test_parser_level_list(download_config):
    download_config["levels"] = "1000,850"
    parsed = config_parser(download_config, "era5-download")
    assert parsed["levels"] == [1000, 850]


@pytest.mark.parametrize("bad", ["999", "abc", "1000,7"])
def test_parser_bad_levels(download_config, bad):
    download_config["levels"] = bad
    with pytest.raises(ValueError):
        config_parser(download_config, "era5-download")


# ------------------------------------------------------------- svd section


def test_parser_svd_happy_path(svd_config):
    parsed = config_parser(svd_config, "era5-svd")
    assert parsed["svd_type"] == "standard"
    assert parsed["delay_embedding"] == 2
    assert parsed["mean_center"] is True
    assert parsed["scale"] is False
    assert parsed["n_components"] == 10
    assert parsed["save_data_matrix"] is True
    assert parsed["era5_svd_path"].endswith(
        "data/era5_svd/2019-01-01T00_2019-01-02T00_1h.h5"
    )
    assert parsed["precision"] == "float32"


def test_parser_svd_bad_type(svd_config):
    svd_config["svd_type"] = "magic"
    with pytest.raises(ValueError, match="Invalid SVD type"):
        config_parser(svd_config, "era5-svd")


@pytest.mark.parametrize("bad", [0, -1, 1.5, "2", True])
def test_parser_svd_bad_delay(svd_config, bad):
    svd_config["delay_embedding"] = bad
    with pytest.raises(ValueError, match="[Dd]elay"):
        config_parser(svd_config, "era5-svd")


@pytest.mark.parametrize("flag", ["mean_center", "scale", "save_data_matrix"])
def test_parser_svd_bad_bool(svd_config, flag):
    svd_config[flag] = "yes"
    with pytest.raises(ValueError, match=flag):
        config_parser(svd_config, "era5-svd")


@pytest.mark.parametrize("bad", [0, -3, 2.5, "10"])
def test_parser_svd_bad_n_components(svd_config, bad):
    svd_config["n_components"] = bad
    with pytest.raises(ValueError, match="components"):
        config_parser(svd_config, "era5-svd")


def test_parser_svd_bad_precision(svd_config):
    svd_config["precision"] = "fp8"
    with pytest.raises(ValueError, match="precision"):
        config_parser(svd_config, "era5-svd")


def test_parser_svd_precision_bf16(svd_config):
    svd_config["precision"] = "bfloat16"
    parsed = config_parser(svd_config, "era5-svd")
    assert parsed["precision"] == "bfloat16"


def test_repo_config_ini_parses():
    """The shipped config.ini must parse cleanly for both sections."""
    import pathlib

    repo_ini = pathlib.Path(__file__).resolve().parents[1] / "config.ini"
    for section in ("era5-download", "era5-svd", "era5-dmd"):
        cfg = config_reader(section, repo_ini)
        config_parser(cfg, section)


def test_parser_dmd_section(svd_config):
    cfg = {**svd_config, "dmd_rank": 4, "optimized": True, "forecast_steps": 12}
    parsed = config_parser(cfg, "era5-dmd")
    assert parsed["dmd_rank"] == 4
    assert parsed["optimized"] is True
    assert parsed["forecast_steps"] == 12
    assert parsed["lm_max_iter"] == 50
    assert parsed["bagging_trials"] == 0
    assert parsed["bagging_fraction"] == 0.8
    assert parsed["multiresolution_levels"] == 0
    assert parsed["mr_max_cycles"] == 1.0
    assert parsed["era5_dmd_path"].endswith(
        "data/era5_dmd/2019-01-01T00_2019-01-02T00_1h.h5"
    )


@pytest.mark.parametrize(
    "patch",
    [
        {"dmd_rank": 0},
        {"dmd_rank": 99},  # exceeds n_components
        {"dmd_rank": True},
        {"optimized": "yes"},
        {"forecast_steps": -1},
        {"lm_max_iter": 0},
        {"bagging_trials": -1},
        {"bagging_trials": 2.5},
        {"bagging_trials": 4, "optimized": False},
        {"bagging_fraction": 0.0},
        {"bagging_fraction": 1.5},
        {"multiresolution_levels": -1},
        {"multiresolution_levels": 2.5},
        {"mr_max_cycles": 0.0},
        {"mr_max_cycles": "fast"},
    ],
)
def test_parser_dmd_validation(svd_config, patch):
    cfg = {**svd_config, "dmd_rank": 4, "optimized": True, **patch}
    with pytest.raises(ValueError):
        config_parser(cfg, "era5-dmd")


def test_parser_svd_dcn_mesh_shape(svd_config):
    # default: single-slice ("none"/absent both normalize to None)
    parsed = config_parser(dict(svd_config), "era5-svd")
    assert parsed["dcn_mesh_shape"] is None
    svd_config["dcn_mesh_shape"] = "none"
    parsed = config_parser(dict(svd_config), "era5-svd")
    assert parsed["dcn_mesh_shape"] is None
    svd_config["dcn_mesh_shape"] = "data=2"
    parsed = config_parser(dict(svd_config), "era5-svd")
    assert parsed["dcn_mesh_shape"] == "data=2"
