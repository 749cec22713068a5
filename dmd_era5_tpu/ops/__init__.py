from dmd_era5_tpu.ops.onepass import OnePassSketch, onepass_svd
from dmd_era5_tpu.ops.svd import (
    SVDResult,
    exact_truncated_svd,
    randomized_svd,
    randomized_svd_2d,
    truncated_svd,
)
from dmd_era5_tpu.ops.tsqr import qr_positive, tsqr

__all__ = [
    "SVDResult",
    "exact_truncated_svd",
    "randomized_svd",
    "randomized_svd_2d",
    "truncated_svd",
    "qr_positive",
    "tsqr",
    "OnePassSketch",
    "onepass_svd",
]
