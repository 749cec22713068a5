"""Snapshot-matrix construction: slicing, transforms, mock data, loaders."""

from dmd_era5_tpu.snapmat.mock import create_mock_era5, create_mock_era5_svd
from dmd_era5_tpu.snapmat.slicing import (
    dataset_time_bounds,
    resample_era5_dataset,
    slice_era5_dataset,
)
from dmd_era5_tpu.snapmat.transform import (
    apply_delay_embedding,
    delay_embed_np,
    flatten_era5_variables,
    space_coord_to_level_lat_lon,
    standardize_data,
)
from dmd_era5_tpu.snapmat.zarr_reader import open_zarr_group

__all__ = [
    "open_zarr_group",
    "create_mock_era5",
    "create_mock_era5_svd",
    "slice_era5_dataset",
    "resample_era5_dataset",
    "dataset_time_bounds",
    "standardize_data",
    "flatten_era5_variables",
    "apply_delay_embedding",
    "delay_embed_np",
    "space_coord_to_level_lat_lon",
]
