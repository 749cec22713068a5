"""Incremental SVD artifacts: extend a decomposition with new snapshots.

North-star config 5 (BASELINE.json): "streaming/updating rank-k SVD
with versioned incremental snapshots".  Given an existing SVD artifact
and a new ERA5 slice that extends the time range, the factorization is
updated with ``ops.streaming.svd_rank_update`` — no refactorization of
the history — and written/versioned as a new artifact.

Preprocessing consistency: the new columns are standardized with the
**original window's statistics** (X_mean/X_std stored in the artifact),
so the updated factors decompose the same matrix the original window
defined.  Delay embedding is applied within the new slice; the d-1
windows straddling the boundary are skipped (pass a slice overlapping
the old window by d-1 snapshots to include them).
"""

from __future__ import annotations

from datetime import datetime

import jax.numpy as jnp
import numpy as np

from dmd_era5_tpu.core.logging import log_and_print, setup_logger
from dmd_era5_tpu.ops.streaming import svd_rank_update
from dmd_era5_tpu.ops.svd import SVDResult
from dmd_era5_tpu.snapmat import delay_embed_np, flatten_era5_variables
from dmd_era5_tpu.utils.labels import Coord, Field, FieldSet

logger = setup_logger("ERA5-SVD-Update", "era5_svd_update.log")

__all__ = ["update_svd_results"]


def update_svd_results(
    svd_results: FieldSet,
    new_slice: FieldSet,
    n_components: int | None = None,
) -> FieldSet:
    """Append a new time slice to an existing SVD results FieldSet.

    Args:
        svd_results: the existing artifact (must match the slice's
            variables/levels; produced by pipeline.era5_svd).
        new_slice: an ERA5 FieldSet whose time range extends the
            artifact's, same variables/levels.
        n_components: rank of the updated factorization (default: keep).

    Returns a new FieldSet with updated U/s/V, extended time coord, and
    refreshed attrs.
    """
    attrs = svd_results.attrs
    d = int(attrs["delay_embedding"])
    variables = (
        attrs["variables"]
        if isinstance(attrs["variables"], list)
        else [attrs["variables"]]
    )

    # --- preprocess the new columns with the original statistics ---
    da_flat = flatten_era5_variables(new_slice[variables])
    x_new = np.asarray(da_flat.data, dtype=np.float32)  # (S, T_new)
    s_rows = x_new.shape[0]

    if "X_mean" in svd_results:
        mean_tiled = np.asarray(svd_results["X_mean"].data, dtype=np.float32)
        x_new = x_new - mean_tiled[:s_rows, None]
    if "X_std" in svd_results:
        std_tiled = np.asarray(svd_results["X_std"].data, dtype=np.float32)
        x_new = x_new / std_tiled[:s_rows, None]

    emb = delay_embed_np(x_new, d)  # (S*d, T_new-d+1)

    # --- rank update ---
    old = SVDResult(
        jnp.asarray(np.asarray(svd_results["U"].data, dtype=np.float32)),
        jnp.asarray(np.asarray(svd_results["s"].data, dtype=np.float32)),
        jnp.asarray(np.asarray(svd_results["V"].data, dtype=np.float32)),
    )
    log_and_print(
        logger,
        f"Updating rank-{old.s.shape[0]} SVD with {emb.shape[1]} new columns...",
    )
    updated = svd_rank_update(old, jnp.asarray(emb), n_components=n_components)

    # --- rebuild the FieldSet with the extended time coordinate ---
    old_times = np.asarray(svd_results["V"].coords["time"].values)
    new_times = np.asarray(new_slice.coord("time").values)[d - 1 :]
    times_all = np.concatenate([old_times, new_times])

    k = updated.s.shape[0]
    components = Coord("components", np.arange(k))
    u_field = svd_results["U"]
    data_vars: dict[str, Field] = {
        "U": Field(
            np.asarray(updated.U),
            ("space", "components"),
            {**{n: c for n, c in u_field.coords.items() if n != "components"},
             "components": components},
            name="U",
        ),
        "s": Field(
            np.asarray(updated.s), ("components",),
            {"components": components}, name="s",
        ),
        "V": Field(
            np.asarray(updated.V),
            ("components", "time"),
            {"components": components, "time": Coord("time", times_all)},
            name="V",
        ),
    }
    for extra in ("X_mean", "X_std"):
        if extra in svd_results:
            data_vars[extra] = svd_results[extra]

    out = FieldSet(data_vars, attrs=dict(attrs))
    out.attrs["n_components"] = int(k)
    out.attrs["updated_through"] = str(np.asarray(new_times[-1] if len(new_times) else old_times[-1]))
    out.attrs["date_processed"] = datetime.now().isoformat()
    return out
