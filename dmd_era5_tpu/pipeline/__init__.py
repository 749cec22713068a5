from dmd_era5_tpu.pipeline.artifacts import (
    add_data_to_dvc,
    add_data_to_store,
    file_md5,
    retrieve_data_from_dvc,
    retrieve_data_from_store,
)
from dmd_era5_tpu.pipeline.era5_download import download_era5_data
from dmd_era5_tpu.pipeline.era5_svd import (
    combine_svd_results,
    retrieve_era5_slice,
    retrieve_svd_results,
    svd_on_era5,
)

__all__ = [
    "add_data_to_store",
    "retrieve_data_from_store",
    "add_data_to_dvc",
    "retrieve_data_from_dvc",
    "file_md5",
    "download_era5_data",
    "svd_on_era5",
    "combine_svd_results",
    "retrieve_era5_slice",
    "retrieve_svd_results",
]
