"""Decomposition stage: truncated SVD of the preprocessed ERA5 slice.

Behavioral parity with the reference stage
(/root/reference/src/dmd_era5/era5_svd/era5_svd.py:42-478): three-level
cache (workdir attr-match -> versioned store -> compute), the preprocess
chain (subset vars -> slice levels -> resample -> standardize -> flatten
-> delay-embed -> tile mean/std across delay blocks), decomposition, and
the packaged results dataset — with the decomposition itself running on
the TPU mesh through ``ops.truncated_svd`` (distributed TSQR / sketch)
instead of numpy/sklearn in host RAM.

Run as ``python -m dmd_era5_tpu.pipeline.era5_svd``.
"""

from __future__ import annotations

import os
from datetime import datetime

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dmd_era5_tpu.core import config_parser, config_reader, log_and_print, setup_logger
from dmd_era5_tpu.ops import truncated_svd
from dmd_era5_tpu.parallel import AXIS_SPACE, make_mesh, shard_rows
from dmd_era5_tpu.pipeline.artifacts import add_data_to_store, retrieve_data_from_store
from dmd_era5_tpu.snapmat import (
    apply_delay_embedding,
    flatten_era5_variables,
    resample_era5_dataset,
    slice_era5_dataset,
    space_coord_to_level_lat_lon,
    standardize_data,
)
from dmd_era5_tpu.utils.io_h5 import load_fieldset, save_fieldset
from dmd_era5_tpu.utils.labels import Coord, Field, FieldSet

logger = setup_logger("ERA5-SVD", "era5_svd.log")

__all__ = [
    "add_config_attributes",
    "retrieve_era5_slice",
    "retrieve_svd_results",
    "svd_on_era5",
    "combine_svd_results",
    "main",
]


def add_config_attributes(fs: FieldSet, parsed_config: dict) -> FieldSet:
    """Stamp decomposition provenance (reference era5_svd.py:42-66)."""
    fs.attrs["source_path"] = parsed_config["source_path"]
    fs.attrs["n_components"] = parsed_config["n_components"]
    fs.attrs["variables"] = list(parsed_config["variables"])
    fs.attrs["levels"] = list(parsed_config["levels"])
    fs.attrs["mean_center"] = int(parsed_config["mean_center"])
    fs.attrs["scale"] = int(parsed_config["scale"])
    fs.attrs["delay_embedding"] = parsed_config["delay_embedding"]
    fs.attrs["svd_type"] = parsed_config["svd_type"]
    fs.attrs["era5_slice_path"] = parsed_config["era5_slice_path"]
    fs.attrs["date_processed"] = datetime.now().isoformat()
    fs.attrs["save_data_matrix"] = int(parsed_config["save_data_matrix"])
    return fs


def _as_str_list(value) -> list[str]:
    if isinstance(value, str):
        return [value]
    return [str(v) for v in value]


def _as_int_list(value) -> list[int]:
    if isinstance(value, (int, np.integer)):
        return [int(value)]
    return [int(v) for v in np.asarray(value).tolist()]


def check_era5_slice(fs: FieldSet, parsed_config: dict) -> bool:
    """Superset-tolerant slice match (reference era5_svd.py:101-114):
    the workdir slice is valid if the requested variables and levels are
    subsets of what it contains and the source matches."""
    attrs = fs.attrs
    want_vars = sorted(parsed_config["variables"])
    want_levels = sorted(parsed_config["levels"])
    have_vars = set(_as_str_list(attrs.get("variables", [])))
    have_levels = set(_as_int_list(attrs.get("levels", [])))
    return (
        want_vars == sorted(have_vars & set(want_vars))
        and want_levels == sorted(have_levels & set(want_levels))
        and parsed_config["source_path"] == attrs.get("source_path")
    )


def check_svd_results(fs: FieldSet, parsed_config: dict) -> bool:
    """Exact-config SVD match (reference era5_svd.py:178-188)."""
    attrs = fs.attrs
    return (
        parsed_config["source_path"] == attrs.get("source_path")
        and parsed_config["n_components"] == attrs.get("n_components")
        and list(parsed_config["variables"]) == _as_str_list(attrs.get("variables", []))
        and list(parsed_config["levels"]) == _as_int_list(attrs.get("levels", []))
        and int(parsed_config["mean_center"]) == attrs.get("mean_center")
        and int(parsed_config["scale"]) == attrs.get("scale")
        and parsed_config["delay_embedding"] == attrs.get("delay_embedding")
    )


def _retrieve(
    parsed_config: dict,
    use_store: bool,
    path_key: str,
    data_type: str,
    checker,
    label: str,
) -> tuple[FieldSet | None, bool]:
    """Shared workdir -> store retrieval ladder (era5_svd.py:130-228)."""
    retrieved_from_store = False

    def from_store() -> FieldSet | None:
        log_and_print(logger, f"Attempting to retrieve {label} from store...")
        try:
            retrieve_data_from_store(parsed_config, data_type=data_type)
            log_and_print(
                logger, f"{label} retrieved: {parsed_config[path_key]}"
            )
            return load_fieldset(parsed_config[path_key])
        except (FileNotFoundError, ValueError) as err:
            log_and_print(
                logger, f"Could not retrieve {label} from store: {err}", "warning"
            )
            return None

    if os.path.exists(parsed_config[path_key]):
        log_and_print(logger, f"{label} found in working directory.")
        fs = load_fieldset(parsed_config[path_key])
        if checker(fs, parsed_config):
            log_and_print(logger, f"{label} matches configuration.")
            return fs, retrieved_from_store
        log_and_print(logger, f"{label} does not match configuration.")
        if use_store:
            fs = from_store()
            return fs, fs is not None
        log_and_print(
            logger,
            f"{label} in working directory does not match configuration.",
            "warning",
        )
        return None, retrieved_from_store

    log_and_print(logger, f"{label} not found in working directory.", "warning")
    if use_store:
        fs = from_store()
        return fs, fs is not None
    return None, retrieved_from_store


def retrieve_era5_slice(
    parsed_config: dict, use_store: bool = False
) -> tuple[FieldSet | None, bool]:
    return _retrieve(
        parsed_config,
        use_store,
        "era5_slice_path",
        "era5_slice",
        check_era5_slice,
        "ERA5 slice",
    )


def retrieve_svd_results(
    parsed_config: dict, use_store: bool = False
) -> tuple[FieldSet | None, bool]:
    return _retrieve(
        parsed_config,
        use_store,
        "save_path",
        "era5_svd",
        check_svd_results,
        "SVD results",
    )


def svd_on_era5(
    da: Field,
    parsed_config: dict,
    mesh: Mesh | None = None,
    da_flat: Field | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Truncated SVD of the preprocessed snapshot matrix on the mesh.

    Semantics of the reference dispatcher (era5_svd.py:230-263), compute
    path replaced by the distributed TSQR / randomized-sketch kernels.

    When the un-embedded matrix ``da_flat`` is provided and the config
    asks for the randomized SVD with delay d > 1 on a single device, the
    decomposition runs through the Hankel operators
    (ops.hankel.hankel_randomized_svd): the device receives (S, T)
    instead of the d-times-larger embedded copy, with identical results.
    """
    svd_type = parsed_config["svd_type"]
    n_components = parsed_config["n_components"]
    d = int(parsed_config.get("delay_embedding", 1))
    gemm_dtype = (
        jnp.bfloat16
        if parsed_config.get("precision") == "bfloat16"
        else jnp.float32
    )
    if mesh is None:
        mesh = make_mesh(parsed_config.get("mesh_shape", "auto"))
    single_device = mesh.devices.size == 1

    if (
        svd_type == "randomized"
        and d > 1
        and da_flat is not None
        and single_device
    ):
        from dmd_era5_tpu.ops.hankel import hankel_randomized_svd

        x_flat = jnp.asarray(np.asarray(da_flat.data, dtype=np.float32))
        log_and_print(
            logger,
            f"Performing randomized SVD via Hankel operators (d={d}, "
            "embedded matrix never materialized on device)...",
        )
        res = hankel_randomized_svd(x_flat, d, n_components)
        log_and_print(logger, "randomized SVD complete.")
        return np.asarray(res.U), np.asarray(res.s), np.asarray(res.V)

    x = np.asarray(da.data, dtype=np.float32)
    n_rows = x.shape[0]
    xs, _ = shard_rows(x, mesh)
    log_and_print(logger, f"Performing {svd_type} SVD on mesh {dict(mesh.shape)}...")
    res = truncated_svd(
        xs,
        n_components,
        svd_type=svd_type,
        mesh=mesh,
        axis_name=AXIS_SPACE,
        gemm_dtype=gemm_dtype,
    )
    log_and_print(logger, f"{svd_type} SVD complete.")
    # strip padding rows introduced by shard_rows
    u = np.asarray(res.U)[:n_rows]
    return u, np.asarray(res.s), np.asarray(res.V)


def combine_svd_results(
    U: np.ndarray,
    s: np.ndarray,
    V: np.ndarray,
    coords,
    **kwargs: Field | None,
) -> FieldSet:
    """Package U/s/V (+ optional X, X_mean, X_std) into a FieldSet,
    matching the reference schema (era5_svd.py:266-333)."""
    components = np.arange(U.shape[1])
    u_field = Field(
        U,
        dims=("space", "components"),
        coords={
            "space": Coord("space", coords["space"].values),
            "components": Coord("components", components),
            "original_variable": Coord(
                "space", coords["original_variable"].values
            ),
            "delay": Coord("space", coords["delay"].values),
        },
        name="U",
    )
    s_field = Field(
        s,
        dims=("components",),
        coords={"components": Coord("components", np.arange(s.shape[0]))},
        name="s",
    )
    v_field = Field(
        V,
        dims=("components", "time"),
        coords={
            "components": Coord("components", np.arange(V.shape[0])),
            "time": Coord("time", coords["time"].values),
        },
        name="V",
    )
    data_vars: dict[str, Field] = {"U": u_field, "s": s_field, "V": v_field}
    for key in ("X", "X_mean", "X_std"):
        value = kwargs.get(key)
        if value is not None:
            data_vars[key] = value.copy()
            data_vars[key].name = key
    return FieldSet(data_vars)


def _tile_field_along_space(field: Field, d: int) -> Field:
    """Repeat a (space,) field d times along space — the mean/std tiling
    that matches the delay-embedded row layout (era5_svd.py:400-414)."""
    data = np.tile(np.asarray(field.data), d)
    coords = {
        "space": Coord("space", np.tile(field.coords["space"].values, d)),
        "original_variable": Coord(
            "space", np.tile(field.coords["original_variable"].values, d)
        ),
    }
    return Field(data, ("space",), coords, dict(field.attrs), field.name)


def main(
    config: dict | None = None,
    write_artifact: bool = False,
    use_store: bool = False,
    mesh: Mesh | None = None,
) -> tuple[FieldSet, bool, bool]:
    """SVD stage orchestration (reference era5_svd.py:336-452).

    Returns (svd_results, added_to_store, retrieved_from_store).
    """
    if config is None:
        config = config_reader("era5-svd")
    added_to_store = False
    parsed_config = config_parser(config, "era5-svd")

    try:
        svd_results, retrieved_from_store = retrieve_svd_results(
            parsed_config, use_store
        )
    except Exception as err:
        msg = f"Error retrieving SVD results: {err}"
        log_and_print(logger, msg, "error")
        raise Exception(msg) from err

    if svd_results is None:
        try:
            ds, _ = retrieve_era5_slice(parsed_config, use_store)
            if ds is None:
                if use_store:
                    msg = "Could not retrieve ERA5 slice from working directory or store."
                else:
                    msg = (
                        "Could not retrieve ERA5 slice from working directory. "
                        "Consider using the artifact store, if available."
                    )
                log_and_print(logger, msg, "error")
                raise FileNotFoundError(msg)
        except Exception as err:
            msg = f"Error retrieving ERA5 slice: {err}"
            log_and_print(logger, msg, "error")
            raise Exception(msg) from err

        try:
            ds = ds[parsed_config["variables"]]
            ds = slice_era5_dataset(ds, levels=parsed_config["levels"])
            ds = resample_era5_dataset(ds, parsed_config["delta_time"])
            if parsed_config["mean_center"] and parsed_config["scale"]:
                ds, ds_mean, ds_std = standardize_data(ds)
            elif parsed_config["mean_center"]:
                ds, ds_mean, ds_std = standardize_data(ds, scale=False)
            else:
                ds_mean = None
                ds_std = None
            da_flat = flatten_era5_variables(ds)
            da = apply_delay_embedding(da_flat, parsed_config["delay_embedding"])

            d = parsed_config["delay_embedding"]
            da_mean = None
            da_std = None
            if ds_mean is not None:
                da_mean = flatten_era5_variables(ds_mean)
                if d > 1:
                    da_mean = _tile_field_along_space(da_mean, d)
                da_mean.name = "X_mean"
                if ds_std is not None:
                    da_std = flatten_era5_variables(ds_std)
                    if d > 1:
                        da_std = _tile_field_along_space(da_std, d)
                    da_std.name = "X_std"

            U, s, V = svd_on_era5(da, parsed_config, mesh=mesh, da_flat=da_flat)
            if parsed_config["save_data_matrix"]:
                svd_results = combine_svd_results(
                    U, s, V, da.coords, X=da, X_mean=da_mean, X_std=da_std
                )
            else:
                svd_results = combine_svd_results(
                    U, s, V, da.coords, X_mean=da_mean, X_std=da_std
                )
            svd_results = add_config_attributes(svd_results, parsed_config)
            svd_results = space_coord_to_level_lat_lon(svd_results)
        except Exception as err:
            msg = f"Error in the SVD on ERA5 process: {err}"
            log_and_print(logger, msg, "error")
            raise Exception(msg) from err

        if write_artifact:
            try:
                log_and_print(logger, "Writing SVD results...")
                save_fieldset(svd_results, parsed_config["save_path"])
                log_and_print(
                    logger, f"SVD results written to {parsed_config['save_path']}"
                )
            except Exception as err:
                msg = f"Error writing SVD results: {err}"
                log_and_print(logger, msg, "error")
                raise Exception(msg) from err
            if use_store:
                try:
                    log_and_print(logger, "Versioning SVD results...")
                    add_data_to_store(
                        parsed_config["save_path"], svd_results.attrs
                    )
                    log_and_print(logger, "SVD results versioned.")
                    added_to_store = True
                except Exception as err:
                    msg = f"Error versioning SVD results: {err}"
                    log_and_print(logger, msg, "error")
                    raise Exception(msg) from err

    return svd_results, added_to_store, retrieved_from_store


if __name__ == "__main__":
    main(write_artifact=True, use_store=True)
