"""EP batched fits + local-file ingest source."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from dmd_era5_tpu.parallel import make_mesh
from dmd_era5_tpu.pipeline import era5_download
from dmd_era5_tpu.pipeline.ensemble import fit_per_variable_level
from dmd_era5_tpu.snapmat import create_mock_era5
from dmd_era5_tpu.utils.io_h5 import save_fieldset


def test_fit_per_variable_level_labels_and_shapes():
    fs = create_mock_era5(
        "2020-01-01",
        "2020-01-01T23",
        ["temperature", "u_component_of_wind"],
        [1000, 850, 500],
        seed=4,
    )
    mesh = make_mesh("data=2,space=4")
    fit = fit_per_variable_level(fs, n_components=4, mesh=mesh)
    assert len(fit.labels) == 6  # 2 vars x 3 levels
    assert fit.labels[0] == ("temperature", 1000)
    assert fit.labels[3] == ("u_component_of_wind", 1000)
    assert fit.state.u.shape == (6, 36 * 72, 4)
    assert fit.state.s.shape == (6, 4)
    assert fit.state.a_red.shape == (6, 4, 4)
    # every entry's POD basis is orthonormal
    for b in range(6):
        u = np.asarray(fit.state.u)[b]
        np.testing.assert_allclose(u.T @ u, np.eye(4), atol=2e-3)


def test_fit_per_variable_level_matches_separate_fits():
    fs = create_mock_era5(
        "2020-01-01", "2020-01-01T23", ["temperature"], [1000, 500], seed=6
    )
    mesh = make_mesh("data=2,space=2")
    fit = fit_per_variable_level(fs, n_components=3, mesh=mesh, seed=9)

    # per-level singular values match an independent host SVD
    arr = np.asarray(
        fs["temperature"]
        .transpose("time", "level", "latitude", "longitude")
        .data,
        dtype=np.float32,
    )
    for li in range(2):
        x = arr[:, li].reshape(arr.shape[0], -1).T
        xc = x - x.mean(axis=1, keepdims=True)
        s_host = np.linalg.svd(xc, compute_uv=False)[:3]
        np.testing.assert_allclose(
            np.asarray(fit.state.s)[li], s_host, rtol=5e-2
        )


def test_fit_per_variable_level_solve_dmd():
    """solve_dmd=True returns per-member varpro eigenvalues/modes from
    ONE batched LM, agreeing with the per-member optdmd_from_svd loop."""
    from dmd_era5_tpu.models.optdmd import optdmd_from_svd
    from dmd_era5_tpu.pipeline.era5_dmd import _hours_since_start

    fs = create_mock_era5(
        "2020-01-01", "2020-01-01T23", ["temperature"], [1000, 500], seed=6
    )
    mesh = make_mesh("data=2,space=2")
    k = 3
    fit = fit_per_variable_level(
        fs, n_components=k, mesh=mesh, seed=9,
        solve_dmd=True, dmd_max_iter=15,
    )
    dmd = fit.dmd
    assert dmd is not None
    assert dmd.alpha.shape == (2, k)
    assert dmd.modes.shape == (2, 36 * 72, k)
    assert dmd.amplitudes.shape == (2, k)
    assert np.all(dmd.residual >= 0)

    t_hours = _hours_since_start(np.asarray(fs.coord("time").values))
    for b in range(2):
        solo = optdmd_from_svd(
            fit.state.u[b], fit.state.s[b], fit.state.v[b],
            jnp.asarray(t_hours), max_iter=15,
        )
        np.testing.assert_allclose(
            np.sort_complex(dmd.alpha[b]),
            np.sort_complex(solo.alpha),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            dmd.amplitudes[b], solo.amplitudes, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            dmd.residual[b], solo.residual, atol=1e-5
        )


def test_download_from_local_file_source(tmp_path):
    """Ingest from a pre-staged local HDF5 dataset (no-network path)."""
    world = create_mock_era5(
        "2019-01-01", "2019-01-10", ["temperature"], [1000, 850], seed=8
    )
    source = tmp_path / "staged_era5.h5"
    save_fieldset(world, source)

    config = {
        "source_path": str(source),
        "start_datetime": "2019-01-02T00",
        "end_datetime": "2019-01-03T00",
        "delta_time": "6h",
        "variables": "temperature",
        "levels": "850",
    }
    parsed = era5_download.config_parser(config, "era5-download")
    fs = era5_download.download_era5_data(parsed, use_mock_data=False)
    assert fs.sizes["time"] == 5  # 24h at 6h stride inclusive
    assert list(fs.coord("level").values) == [850]
    assert fs.attrs["source_path"] == str(source)
    import os

    assert os.path.exists(parsed["save_path"])  # real ingest persists
