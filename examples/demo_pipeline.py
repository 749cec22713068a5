"""End-to-end demo: mock ERA5 -> distributed SVD -> optimized DMD -> forecast.

The scripted equivalent of the reference's example notebook
(/root/reference/examples/notebook_test.ipynb): runs the full three-stage
pipeline on mock data, then inspects the artifacts.

Run from the repo root:  python examples/demo_pipeline.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from dmd_era5_tpu.pipeline import era5_dmd, era5_download  # noqa: E402

# source_path "mock_data": the mock ingest stamps this into the artifact
# (reference behavior, era5_download.py:74), and the SVD stage's cache
# matcher compares against it
CONFIG = {
    "source_path": "mock_data",
    "start_datetime": "2019-01-01T00",
    "end_datetime": "2019-01-03T00",
    "delta_time": "1h",
    "variables": "temperature,u_component_of_wind",
    "levels": "1000,850",
    "svd_type": "randomized",
    "delay_embedding": 2,
    "mean_center": True,
    "scale": False,
    "n_components": 16,
    "save_data_matrix": False,
    "dmd_rank": 10,
    "optimized": True,
    "forecast_steps": 12,
    "forecast_holdout": 6,
    "lm_max_iter": 40,
}


def main() -> None:
    print("=== stage 1: ingest (mock backend) ===")
    era5_download.main(CONFIG, use_mock_data=True, use_store=True)

    print("\n=== stages 2+3: distributed SVD -> optimized DMD ===")
    results, added, retrieved = era5_dmd.main(
        CONFIG, write_artifact=True, use_store=True
    )

    print("\n=== results ===")
    eigs = results["eigenvalues"].values
    amps = results["amplitudes"].values
    print(f"continuous eigenvalues (1/hour), by |amplitude|:")
    for i in np.argsort(-amps):
        print(
            f"  alpha = {eigs[i].real:+.4f} {eigs[i].imag:+.4f}i   "
            f"|b| = {amps[i]:.2f}   period = "
            f"{2 * np.pi / abs(eigs[i].imag):.1f} h"
            if eigs[i].imag
            else f"  alpha = {eigs[i].real:+.4f} (non-oscillatory)  |b| = {amps[i]:.2f}"
        )
    print(f"\nDMD residual: {results.attrs['dmd_residual']:.3e}")
    if "forecast_rmse" in results.attrs:
        rmse = results.attrs["forecast_rmse"]
        p_rmse = results.attrs["persistence_rmse"]
        acc = results.attrs["forecast_acc"]
        print(
            f"holdout skill ({len(rmse)} leads): RMSE {rmse[0]:.3f} -> "
            f"{rmse[-1]:.3f} (persistence {p_rmse[0]:.3f} -> "
            f"{p_rmse[-1]:.3f}), ACC {acc[0]:.3f} -> {acc[-1]:.3f}"
        )
    fc = results["forecast"]
    print(f"forecast field: {fc.shape} (space x time, last 12 steps unseen)")
    print(f"artifact versioned: {added}, retrieved from store: {retrieved}")


if __name__ == "__main__":
    main()
