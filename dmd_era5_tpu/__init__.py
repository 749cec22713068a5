"""dmd-era5-tpu: a TPU-native spatiotemporal decomposition engine.

Public API parity with the reference package facade
(/root/reference/src/dmd_era5/__init__.py:9-39) plus the TPU-native
extensions: distributed SVD, optimized DMD, forecasting, and the
parallelism layer.
"""

from __future__ import annotations

__version__ = "0.1.0"

from dmd_era5_tpu.core import (
    config_parser,
    config_reader,
    log_and_print,
    setup_logger,
)
from dmd_era5_tpu.snapmat import (
    apply_delay_embedding,
    create_mock_era5,
    create_mock_era5_svd,
    flatten_era5_variables,
    resample_era5_dataset,
    slice_era5_dataset,
    space_coord_to_level_lat_lon,
    standardize_data,
)
from dmd_era5_tpu.utils import Coord, Field, FieldSet

__all__ = [
    "__version__",
    "config_reader",
    "config_parser",
    "setup_logger",
    "log_and_print",
    "create_mock_era5",
    "create_mock_era5_svd",
    "slice_era5_dataset",
    "resample_era5_dataset",
    "standardize_data",
    "flatten_era5_variables",
    "apply_delay_embedding",
    "space_coord_to_level_lat_lon",
    "Coord",
    "Field",
    "FieldSet",
]
