from dmd_era5_tpu.models.analysis import (
    ModeSpectrum,
    mode_spectrum,
    modes_to_grid,
)
from dmd_era5_tpu.models.bopdmd import (
    BOPDMDResult,
    bopdmd_from_svd,
    fit_bopdmd,
)
from dmd_era5_tpu.models.dmd import DMDResult, dmd_from_svd, exact_dmd, reconstruct
from dmd_era5_tpu.models.dmdc import DMDcResult, dmdc_rollout, fit_dmdc
from dmd_era5_tpu.models.mrdmd import (
    MrDMDLevel,
    MrDMDResult,
    fit_mrdmd,
    mrdmd_from_svd,
    mrdmd_reconstruct,
)
from dmd_era5_tpu.models.forecast import (
    forecast_times,
    iter_forecast_blocks,
    rollout,
    streamed_forecast_scores,
    undo_preprocessing,
)
from dmd_era5_tpu.models.verification import (
    ScoreAccumulator,
    forecast_scores,
    latitude_weights,
    weighted_acc,
    weighted_bias,
    weighted_rmse,
)
from dmd_era5_tpu.models.optdmd import (
    OptDMDResult,
    fit_optdmd,
    optdmd_from_svd,
    optdmd_reconstruct,
    varpro_lm,
    varpro_lm_checkpointed,
)

__all__ = [
    "ModeSpectrum",
    "mode_spectrum",
    "modes_to_grid",
    "BOPDMDResult",
    "bopdmd_from_svd",
    "fit_bopdmd",
    "DMDResult",
    "DMDcResult",
    "dmdc_rollout",
    "fit_dmdc",
    "MrDMDLevel",
    "MrDMDResult",
    "fit_mrdmd",
    "mrdmd_from_svd",
    "mrdmd_reconstruct",
    "exact_dmd",
    "dmd_from_svd",
    "reconstruct",
    "OptDMDResult",
    "fit_optdmd",
    "optdmd_from_svd",
    "optdmd_reconstruct",
    "varpro_lm",
    "varpro_lm_checkpointed",
    "rollout",
    "iter_forecast_blocks",
    "streamed_forecast_scores",
    "ScoreAccumulator",
    "forecast_scores",
    "latitude_weights",
    "weighted_acc",
    "weighted_bias",
    "weighted_rmse",
    "forecast_times",
    "undo_preprocessing",
]
