"""Ingest stage: ERA5 slice acquisition.

Behavioral parity with the reference stage
(/root/reference/src/dmd_era5/era5_download/era5_download.py:25-220):
retrieve-from-store or acquire (mock backend or remote Zarr), slice by
time/levels, resample when delta > 1h, stamp config attributes, persist,
version.  The remote-Zarr path is gated on the optional zarr/gcsfs
dependencies (absent in this environment) with a clear error; the mock
backend — the test backbone — is always available.

Run as ``python -m dmd_era5_tpu.pipeline.era5_download``.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np

from dmd_era5_tpu.core import config_parser, config_reader, log_and_print, setup_logger
from dmd_era5_tpu.pipeline.artifacts import add_data_to_store, retrieve_data_from_store
from dmd_era5_tpu.snapmat import (
    create_mock_era5,
    resample_era5_dataset,
    slice_era5_dataset,
)
from dmd_era5_tpu.utils.io_h5 import load_fieldset, save_fieldset
from dmd_era5_tpu.utils.labels import FieldSet

logger = setup_logger("ERA5Download", "era5_download.log")

__all__ = ["add_config_attributes", "download_era5_data", "main"]


def add_config_attributes(fs: FieldSet, parsed_config: dict) -> FieldSet:
    """Stamp provenance attributes (reference era5_download.py:25-43)."""
    fs.attrs["source_path"] = parsed_config["source_path"]
    fs.attrs["start_datetime"] = parsed_config["start_datetime"].isoformat()
    fs.attrs["end_datetime"] = parsed_config["end_datetime"].isoformat()
    fs.attrs["hours_delta_time"] = (
        parsed_config["delta_time"].total_seconds() / 3600
    )
    fs.attrs["variables"] = list(parsed_config["variables"])
    fs.attrs["levels"] = list(parsed_config["levels"])
    fs.attrs["date_downloaded"] = datetime.now().isoformat()
    return fs


def _open_remote_era5(parsed_config: dict) -> FieldSet:
    """Open an ERA5 Zarr store (local directory or gs:// URL).

    The production ingest path of the reference
    (era5_download.py:81-83: ``xr.open_zarr("gs://...", chunks=...)``),
    implemented via the bundled Zarr v2 reader (snapmat/zarr_reader.py)
    with slice pushdown: only the chunks covering the requested
    time range and levels are fetched — gs:// URLs ride the installed
    gcsfs, local stores read directly.
    """
    from dmd_era5_tpu.snapmat.era5_zarr import read_era5_zarr_slice

    return read_era5_zarr_slice(
        parsed_config["source_path"],
        parsed_config["variables"],
        parsed_config["start_datetime"],
        parsed_config["end_datetime"],
        parsed_config["levels"],
    )


def download_era5_data(
    parsed_config: dict, use_mock_data: bool = False
) -> FieldSet:
    """Acquire, slice, resample, stamp, and persist an ERA5 slice.

    Mirrors the reference flow (era5_download.py:46-124): mock data is
    never written to disk and rewrites source_path to "mock_data".
    Emits ingest throughput counters into the artifact attrs
    (``download_seconds`` / ``download_melem_per_s``).
    """
    import time as _time

    t_start = _time.perf_counter()
    try:
        if use_mock_data:
            log_and_print(logger, "Creating mock ERA5 data...")
            full = create_mock_era5(
                start_datetime=parsed_config["start_datetime"],
                end_datetime=parsed_config["end_datetime"],
                variables=parsed_config["variables"],
                levels=parsed_config["levels"],
            )
            parsed_config["source_path"] = "mock_data"
            log_and_print(logger, "Mock ERA5 data created.")
        else:
            log_and_print(logger, "Loading ERA5 Dataset...")
            source = str(parsed_config["source_path"])
            if os.path.isfile(source):
                # local HDF5 source (a pre-staged global dataset) — the
                # no-network ingest path
                full = load_fieldset(source)
            else:
                # Zarr store: local directory or remote URL (gs://...)
                full = _open_remote_era5(parsed_config)
            full = full[parsed_config["variables"]]

        log_and_print(logger, "Slicing ERA5 Dataset...")
        fs = slice_era5_dataset(
            full,
            parsed_config["start_datetime"],
            parsed_config["end_datetime"],
            parsed_config["levels"],
        )
        if parsed_config["delta_time"] > timedelta(hours=1):
            log_and_print(logger, "Resampling ERA5 Dataset in time...")
            fs = resample_era5_dataset(fs, parsed_config["delta_time"])

        fs = add_config_attributes(fs, parsed_config)
        elapsed = _time.perf_counter() - t_start
        elements = sum(
            int(np.prod(f.shape)) for f in fs.data_vars.values()
        )
        fs.attrs["download_seconds"] = round(elapsed, 4)
        fs.attrs["download_melem_per_s"] = round(
            elements / elapsed / 1e6, 4
        )
        log_and_print(
            logger,
            f"Ingest: {elements / 1e6:.2f} Melem in {elapsed:.2f}s "
            f"({elements / elapsed / 1e6:.1f} Melem/s).",
        )

        if not use_mock_data:
            log_and_print(
                logger, f"Saving ERA5 Dataset to {parsed_config['save_path']}..."
            )
            save_fieldset(fs, parsed_config["save_path"])
            log_and_print(logger, "ERA5 Dataset saved.")
        return fs
    except Exception as err:
        verb = "creating mock" if use_mock_data else "downloading"
        msg = f"Error {verb} ERA5 Dataset: {err}"
        log_and_print(logger, msg, level="error")
        raise ValueError(msg) from err


def main(
    config: dict | None = None,
    use_mock_data: bool = False,
    use_store: bool = False,
) -> tuple[bool, bool]:
    """Retrieve-or-acquire orchestration (reference era5_download.py:127-195).

    Returns (added_to_store, retrieved_from_store).  ``use_store`` is the
    analogue of the reference's ``use_dvc``.
    """
    if config is None:
        config = config_reader("era5-download")
    added_to_store = False
    retrieved_from_store = False
    try:
        parsed_config = config_parser(config, "era5-download", logger=logger)

        def acquire_and_version() -> bool:
            fs = download_era5_data(parsed_config, use_mock_data)
            log_and_print(logger, "ERA5 download process completed successfully.")
            try:
                log_and_print(logger, "Versioning ERA5 slice...")
                if use_mock_data:
                    # Mock data skips disk writes in download_era5_data;
                    # persist here so it can be versioned.
                    save_fieldset(fs, parsed_config["save_path"])
                add_data_to_store(parsed_config["save_path"], fs.attrs)
                log_and_print(logger, "ERA5 slice versioned.")
                return True
            except Exception as err:
                log_and_print(
                    logger, f"Error versioning ERA5 slice: {err}", level="error"
                )
                return False

        if use_store:
            log_and_print(logger, "Attempting to retrieve ERA5 slice from store...")
            try:
                retrieve_data_from_store(parsed_config, data_type="era5_slice")
                log_and_print(
                    logger,
                    f"ERA5 slice retrieved: {parsed_config['save_path']}",
                )
                retrieved_from_store = True
            except (FileNotFoundError, ValueError) as err:
                log_and_print(
                    logger,
                    f"Could not retrieve ERA5 slice from store: {err}",
                    level="warning",
                )
                added_to_store = acquire_and_version()
        else:
            download_era5_data(parsed_config, use_mock_data)
            log_and_print(logger, "ERA5 download process completed successfully.")
    except ValueError as err:
        log_and_print(logger, f"Configuration error: {err}", level="error")
    except Exception as err:
        log_and_print(logger, f"ERA5 download process failed: {err}", level="error")

    return added_to_store, retrieved_from_store


if __name__ == "__main__":
    main(use_store=True)
