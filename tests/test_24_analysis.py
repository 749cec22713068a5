"""Spectral analysis utilities: physical units + mode unflattening."""

from __future__ import annotations

import numpy as np
import pytest

from dmd_era5_tpu.core.config_parser import config_parser
from dmd_era5_tpu.models import mode_spectrum, modes_to_grid
from dmd_era5_tpu.pipeline import era5_dmd, era5_download
from dmd_era5_tpu.snapmat import create_mock_era5
from dmd_era5_tpu.utils.io_h5 import save_fieldset


def test_mode_spectrum_units():
    alpha = np.array([-0.1 + 2.0j, 0.0 + 0.0j, -0.5 - 0.7j], np.complex64)
    amps = np.array([1.0, 3.0, 2.0], np.float32)
    sp = mode_spectrum(alpha, amps)
    np.testing.assert_allclose(sp.growth_rate, [-0.1, 0.0, -0.5], rtol=1e-6)
    np.testing.assert_allclose(sp.e_folding[0], 10.0, rtol=1e-6)
    assert np.isinf(sp.e_folding[1])
    np.testing.assert_allclose(sp.frequency[0], 2.0 / (2 * np.pi), rtol=1e-6)
    np.testing.assert_allclose(
        sp.period[0], 2 * np.pi / 2.0, rtol=1e-6
    )
    assert np.isinf(sp.period[1])
    # energy ranking: amplitudes 3, 2, 1 -> order [1, 2, 0]
    assert sp.order.tolist() == [1, 2, 0]


@pytest.fixture()
def dmd_results():
    cfg = {
        "source_path": "gs://mock-bucket/era5.zarr",
        "start_datetime": "2019-06-01T00",
        "end_datetime": "2019-06-02T00",
        "delta_time": "1h",
        "variables": "temperature,u_component_of_wind",
        "levels": "1000,850",
        "svd_type": "standard",
        "delay_embedding": 2,
        "mean_center": True,
        "scale": False,
        "n_components": 8,
        "save_data_matrix": False,
        "dmd_rank": 4,
        "optimized": False,
        "forecast_steps": 0,
        "lm_max_iter": 10,
    }
    parsed = config_parser(cfg, "era5-svd")
    fs = create_mock_era5(
        parsed["start_datetime"],
        parsed["end_datetime"],
        parsed["variables"],
        parsed["levels"],
        seed=31,
    )
    fs = era5_download.add_config_attributes(fs, parsed)
    save_fieldset(fs, parsed["era5_slice_path"])
    results, _, _ = era5_dmd.main(cfg, write_artifact=False)
    return results, cfg


def test_modes_to_grid_roundtrip(dmd_results):
    results, cfg = dmd_results
    grids = modes_to_grid(results, delay_block=0)
    assert set(grids.variables) == {"temperature", "u_component_of_wind"}
    g = grids["temperature"]
    assert g.dims == ("level", "latitude", "longitude", "rank")
    assert g.data.shape == (2, 36, 72, 4)
    # ERA5 grid order preserved: latitude runs 90 -> -90
    lats = g.coords["latitude"].values
    assert lats[0] == 90.0 and lats[-1] == -85.0  # arange(90,-90,-5)
    assert list(g.coords["level"].values) == [1000.0, 850.0]

    # pointwise agreement with the flat modes at sampled sites
    modes = results["modes"]
    flat = np.asarray(modes.data)
    variables = np.asarray(modes.coords["original_variable"].values)
    delay = np.asarray(modes.coords["delay"].values)
    lvl = np.asarray(modes.coords["level"].values, dtype=np.float64)
    lat = np.asarray(modes.coords["latitude"].values, dtype=np.float64)
    lon = np.asarray(modes.coords["longitude"].values, dtype=np.float64)
    rng = np.random.default_rng(0)
    rows = rng.choice(flat.shape[0], size=50, replace=False)
    for row in rows:
        if delay[row] != 0:
            continue
        gv = grids[str(variables[row])]
        li = list(gv.coords["level"].values).index(lvl[row])
        ai = list(gv.coords["latitude"].values).index(lat[row])
        oi = list(gv.coords["longitude"].values).index(lon[row])
        np.testing.assert_allclose(gv.data[li, ai, oi], flat[row], rtol=1e-6)


def test_modes_to_grid_delay_blocks(dmd_results):
    results, _ = dmd_results
    g0 = modes_to_grid(results, delay_block=0)
    g1 = modes_to_grid(results, delay_block=1)
    assert g0["temperature"].data.shape == g1["temperature"].data.shape
    assert not np.allclose(
        g0["temperature"].data, g1["temperature"].data
    )
    with pytest.raises(ValueError, match="delay block"):
        modes_to_grid(results, delay_block=5)


class TestVerification:
    """Forecast skill scores: lat weighting, perfect/degraded forecasts."""

    def _setup(self):
        rng = np.random.default_rng(4)
        lat_axis = np.arange(90, -91, -30, dtype=np.float32)  # 7 rows
        lats = np.repeat(lat_axis, 3)  # 21 rows: 3 lons per lat
        truth = rng.standard_normal((21, 10)).astype(np.float32)
        return lats, truth

    def test_perfect_forecast(self):
        from dmd_era5_tpu.models import forecast_scores

        lats, truth = self._setup()
        scores = forecast_scores(truth.copy(), truth, latitudes=lats)
        np.testing.assert_allclose(scores["rmse"], 0.0, atol=1e-6)
        np.testing.assert_allclose(scores["bias"], 0.0, atol=1e-6)
        np.testing.assert_allclose(scores["acc"], 1.0, atol=1e-5)

    def test_rmse_weighting_downweights_poles(self):
        from dmd_era5_tpu.models import forecast_scores

        lats, truth = self._setup()
        # error ONLY at the poles (lat +/-90: weight 0) -> weighted
        # rmse stays 0; error at the equator -> full weight
        fc_pole = truth.copy()
        fc_pole[lats == 90.0] += 1.0
        s_pole = forecast_scores(fc_pole, truth, latitudes=lats)
        np.testing.assert_allclose(s_pole["rmse"], 0.0, atol=1e-6)

        fc_eq = truth.copy()
        fc_eq[lats == 0.0] += 1.0
        s_eq = forecast_scores(fc_eq, truth, latitudes=lats)
        assert np.all(s_eq["rmse"] > 0.1)

    def test_bias_sign_and_acc_degradation(self):
        from dmd_era5_tpu.models import forecast_scores

        lats, truth = self._setup()
        rng = np.random.default_rng(5)
        fc = truth + 0.5 + 0.0 * rng.standard_normal(truth.shape)
        scores = forecast_scores(fc, truth, latitudes=lats)
        np.testing.assert_allclose(scores["bias"], 0.5, atol=1e-5)
        # pure-noise forecast decorrelates
        noise = rng.standard_normal(truth.shape).astype(np.float32)
        s_noise = forecast_scores(noise, truth, latitudes=lats)
        assert np.abs(s_noise["acc"]).max() < 0.6

    def test_per_row_latitudes_required(self):
        from dmd_era5_tpu.models import forecast_scores

        _, truth = self._setup()
        with pytest.raises(ValueError, match="one latitude per space row"):
            forecast_scores(
                truth, truth, latitudes=np.array([90.0, 0.0, -90.0])
            )

    def test_external_climatology(self):
        from dmd_era5_tpu.models import weighted_acc

        lats, truth = self._setup()
        clim = truth.mean(axis=1)
        a1 = np.asarray(weighted_acc(truth, truth, clim))
        np.testing.assert_allclose(a1, 1.0, atol=1e-5)

    def test_score_accumulator_matches_one_shot(self):
        """Blockwise accumulation == one-shot scores (exact reduction)."""
        from dmd_era5_tpu.models import ScoreAccumulator, forecast_scores
        from dmd_era5_tpu.models.verification import _space_weights

        lats, truth = self._setup()
        rng = np.random.default_rng(7)
        fc = truth + 0.3 * rng.standard_normal(truth.shape).astype(np.float32)
        one_shot = forecast_scores(fc, truth, latitudes=lats)

        w = np.asarray(_space_weights(lats, truth.shape[0]))
        acc = ScoreAccumulator()
        for s0 in range(0, truth.shape[0], 5):  # ragged blocks
            s1 = min(s0 + 5, truth.shape[0])
            acc.update(fc[s0:s1], truth[s0:s1], w[s0:s1])
        blockwise = acc.finalize()
        for key in ("rmse", "acc", "bias"):
            np.testing.assert_allclose(
                blockwise[key], one_shot[key], rtol=1e-5, atol=1e-6
            )

    def test_score_accumulator_empty_raises(self):
        from dmd_era5_tpu.models import ScoreAccumulator

        with pytest.raises(ValueError, match="No blocks"):
            ScoreAccumulator().finalize()


class TestStreamedForecast:
    """Out-of-core rollout (VERDICT r4 item 2): the blockwise path must
    reproduce the dense rollout + undo_preprocessing + one-shot scores
    chain, with no (S*d, T') materialization."""

    def _fit(self, rng, s_rows=96, t_cols=40, d=2, rank=4):
        import jax.numpy as jnp

        from dmd_era5_tpu.models import optdmd_from_svd
        from dmd_era5_tpu.ops.svd import randomized_svd
        from dmd_era5_tpu.snapmat.transform import delay_embed_np

        tgrid = np.linspace(0.0, 3.0, t_cols).astype(np.float32)
        alphas = np.array([-0.1 + 2.0j, -0.3 + 0.7j])
        modes = rng.standard_normal((s_rows, 2))
        x = (
            modes @ np.real(np.exp(np.outer(alphas, tgrid)))
            + 0.01 * rng.standard_normal((s_rows, t_cols))
        ).astype(np.float32)
        xe = delay_embed_np(x, d)  # (s*d, t-d+1)
        svd = randomized_svd(jnp.asarray(xe), rank, seed=0)
        res = optdmd_from_svd(
            svd.U, svd.s, svd.V, jnp.asarray(tgrid[: xe.shape[1]]),
            max_iter=15,
        )
        return res, x, tgrid

    def test_iter_forecast_blocks_matches_dense(self):
        from dmd_era5_tpu.models import (
            iter_forecast_blocks,
            rollout,
            undo_preprocessing,
        )

        rng = np.random.default_rng(11)
        res, x, tgrid = self._fit(rng)
        d = 2
        s_rows = x.shape[0]
        mean = rng.standard_normal(s_rows * d).astype(np.float32)
        std = (1.0 + rng.random(s_rows * d)).astype(np.float32)
        t_eval = np.linspace(0.0, 4.0, 13).astype(np.float32)

        dense = np.asarray(
            undo_preprocessing(rollout(res, t_eval), mean, std, delay=d)
        )
        out = np.empty_like(dense)
        n_blocks = 0
        for s0, blk in iter_forecast_blocks(
            res, t_eval, mean, std, delay=d, block_rows=17
        ):
            out[s0 : s0 + blk.shape[0]] = blk
            n_blocks += 1
        assert n_blocks > 1  # actually exercised the blocking
        np.testing.assert_allclose(out, dense, rtol=1e-5, atol=1e-5)

    def test_streamed_scores_match_one_shot_chain(self):
        from dmd_era5_tpu.models import (
            forecast_scores,
            rollout,
            streamed_forecast_scores,
            undo_preprocessing,
        )

        rng = np.random.default_rng(12)
        res, x, tgrid = self._fit(rng)
        d = 2
        s_rows = x.shape[0]
        lats = np.repeat(
            np.arange(90, -91, -30, dtype=np.float32), s_rows // 7 + 1
        )[:s_rows]
        h = 6
        dt = float(tgrid[1] - tgrid[0])
        t_train_end = tgrid[x.shape[1] - d]  # last embedded column time
        t_lead = (t_train_end + dt * np.arange(1, h + 1)).astype(np.float32)
        truth = rng.standard_normal((s_rows, h)).astype(np.float32)

        # reference: dense rollout chain (the pre-round-5 stage path)
        dense = np.asarray(
            undo_preprocessing(rollout(res, t_lead), None, None, delay=d)
        )
        ref = forecast_scores(dense, truth, latitudes=lats)
        got = streamed_forecast_scores(
            res, t_lead, truth, latitudes=lats, delay=d, block_rows=19
        )
        for key in ("rmse", "acc", "bias"):
            np.testing.assert_allclose(
                got[key], ref[key], rtol=1e-4, atol=1e-5
            )
