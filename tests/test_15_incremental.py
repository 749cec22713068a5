"""Incremental SVD-artifact updates (north-star config 5) + long-T path."""

from __future__ import annotations

import numpy as np
import pytest

from dmd_era5_tpu.core.config_parser import config_parser
from dmd_era5_tpu.pipeline import era5_download, era5_svd
from dmd_era5_tpu.pipeline.incremental import update_svd_results
from dmd_era5_tpu.snapmat import create_mock_era5, delay_embed_np, flatten_era5_variables
from dmd_era5_tpu.utils.io_h5 import save_fieldset


@pytest.fixture()
def base_config():
    return {
        "source_path": "gs://mock-bucket/era5.zarr",
        "start_datetime": "2019-09-01T00",
        "end_datetime": "2019-09-02T00",
        "delta_time": "1h",
        "variables": "temperature",
        "levels": "1000",
        "svd_type": "standard",
        "delay_embedding": 2,
        "mean_center": True,
        "scale": False,
        "n_components": 8,
        "save_data_matrix": False,
        "precision": "float32",
    }


def test_update_svd_results_extends_time(base_config):
    parsed = config_parser(base_config, "era5-svd")
    fs = create_mock_era5(
        parsed["start_datetime"], parsed["end_datetime"],
        parsed["variables"], parsed["levels"], seed=31,
    )
    fs = era5_download.add_config_attributes(fs, parsed)
    save_fieldset(fs, parsed["era5_slice_path"])
    results, _, _ = era5_svd.main(base_config, write_artifact=False)

    t_old = results["V"].sizes["time"]
    new_slice = create_mock_era5(
        "2019-09-02T01", "2019-09-02T12",
        parsed["variables"], parsed["levels"], seed=32,
    )
    updated = update_svd_results(results, new_slice)

    d = base_config["delay_embedding"]
    t_added = 12 - d + 1
    assert updated["V"].sizes["time"] == t_old + t_added
    assert updated["s"].shape == (8,)
    assert updated["U"].shape == results["U"].shape
    # U stays orthonormal
    u = updated["U"].values
    np.testing.assert_allclose(u.T @ u, np.eye(8), atol=2e-3)
    # time coordinate is strictly increasing across the seam
    times = updated["V"].coords["time"].values
    assert np.all(np.diff(times).astype(np.int64) > 0)

    # oracle: the update operates on the *truncated* history, so the
    # exact reference is the SVD of [U diag(s) V, new_cols] — with the
    # original window statistics applied to the new columns
    mean = results["X_mean"].values
    da_new = flatten_era5_variables(new_slice)
    x_new = np.asarray(da_new.data, np.float32)
    x_new = x_new - mean[: x_new.shape[0], None]
    emb_new = delay_embed_np(x_new, d)
    history = (
        results["U"].values
        @ np.diag(results["s"].values)
        @ results["V"].values
    )
    full = np.concatenate([history, emb_new], axis=1)
    s_host = np.linalg.svd(full, compute_uv=False)[:8]
    np.testing.assert_allclose(updated["s"].values, s_host, rtol=2e-3)


def test_incremental_stage_extends_artifact(base_config):
    """Config-driven incremental stage (VERDICT r1 item 9): fit day 1,
    extend with day 2 via pipeline.era5_svd_update.main, factors agree
    with the from-scratch full-window fit within incremental-SVD
    (truncated-history) tolerance."""
    from dmd_era5_tpu.pipeline import era5_svd_update

    # mean_center=False: incremental updates deliberately keep the
    # ORIGINAL window's statistics (X_mean/X_std from the artifact), so
    # with centering the two paths decompose different matrices by
    # design; without it the raw matrices are identical and the only
    # deviation is the rank-8 history truncation
    base_config = {**base_config, "mean_center": False}
    parsed = config_parser(base_config, "era5-svd")
    # stage the day-1 slice, fit, and VERSION the artifact (the update
    # config's derived paths differ, so retrieval goes through the store)
    fs = create_mock_era5(
        parsed["start_datetime"], parsed["end_datetime"],
        parsed["variables"], parsed["levels"], seed=77,
    )
    fs = era5_download.add_config_attributes(fs, parsed)
    save_fieldset(fs, parsed["era5_slice_path"])
    era5_svd.main(base_config, write_artifact=True, use_store=True)

    # extended window: day 1 + day 2 in one slice file
    full_config = {**base_config, "end_datetime": "2019-09-03T00"}
    parsed_full = config_parser(full_config, "era5-svd")
    fs_full = create_mock_era5(
        parsed_full["start_datetime"], parsed_full["end_datetime"],
        parsed_full["variables"], parsed_full["levels"], seed=77,
    )
    fs_full = era5_download.add_config_attributes(fs_full, parsed_full)
    save_fieldset(fs_full, parsed_full["era5_slice_path"])

    updated, added, did_update = era5_svd_update.main(
        full_config, write_artifact=True, use_store=True
    )
    assert did_update and added

    # idempotency: a second run detects full coverage and does nothing
    again, added2, did2 = era5_svd_update.main(
        full_config, write_artifact=False, use_store=True
    )
    assert not did2 and not added2

    # oracle: from-scratch fit of the full window (fresh workdir path —
    # reuse the slice, different save_path via n/a; recompute directly)
    from dmd_era5_tpu.snapmat import apply_delay_embedding

    ds = fs_full[parsed_full["variables"]]
    da = apply_delay_embedding(
        flatten_era5_variables(ds), base_config["delay_embedding"]
    )
    x_full = np.asarray(da.data, np.float32)
    s_host = np.linalg.svd(x_full, compute_uv=False)[:8]
    u_host = np.linalg.svd(x_full, full_matrices=False)[0][:, :8]

    s_inc = updated["s"].values
    # incremental tolerance: the update truncates history to rank 8
    # before appending, so the tail deviates; the resolved leading
    # modes must match
    np.testing.assert_allclose(s_inc[:4], s_host[:4], rtol=2e-2)
    # subspace agreement only where the spectrum resolves it: the mock
    # data's modes 2..8 are nearly degenerate (within ~2%), so their
    # directions rotate freely between algorithms — only mode 1 pins
    cos1 = abs(
        float(updated["U"].values[:, 0] @ u_host[:, 0])
        / np.linalg.norm(updated["U"].values[:, 0])
    )
    assert cos1 > 0.999, cos1
    # rotation-invariant quality: the incremental rank-8 model must
    # reconstruct the full window nearly as well as the from-scratch fit
    recon = (
        updated["U"].values
        @ np.diag(s_inc)
        @ updated["V"].values
    )
    rel_inc = np.linalg.norm(x_full - recon) / np.linalg.norm(x_full)
    energy = np.linalg.norm(x_full) ** 2
    rel_full = np.sqrt(max(energy - np.sum(s_host**2), 0.0) / energy)
    assert rel_inc <= rel_full + 0.02, (rel_inc, rel_full)
    # the updated time coordinate covers the full window
    assert updated["V"].sizes["time"] == x_full.shape[1]


def test_long_time_range_2d_sharded(rng):
    """Full-year-scale T on the grid-sharded path (sequence parallel)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmd_era5_tpu.ops.svd import randomized_svd_2d
    from dmd_era5_tpu.parallel import make_mesh

    mesh = make_mesh("space=2,time=4")
    s, t, k = 64, 8760, 6  # hourly year
    base = rng.standard_normal((s, k)).astype(np.float32)
    coeffs = rng.standard_normal((k, t)).astype(np.float32)
    x = base @ coeffs
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("space", "time"))
    )
    res = randomized_svd_2d(xs, k, mesh=mesh, seed=1)
    s_host = np.linalg.svd(x, compute_uv=False)[:k]
    np.testing.assert_allclose(np.asarray(res.s), s_host, rtol=1e-2)
