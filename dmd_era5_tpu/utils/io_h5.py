"""HDF5 serialization of FieldSets.

The reference writes NetCDF4 via xarray (/root/reference/src/dmd_era5/
era5_download/era5_download.py:114, era5_svd/era5_svd.py:434).  NetCDF4
files *are* HDF5; with no netCDF bindings in this environment we write a
plain HDF5 layout that carries the same information:

    /vars/<name>     datasets, attr "dims" = names, + field attrs
    /coords/<name>   datasets, attr "dims" = names
    root attrs       dataset-level attributes

Tuple-valued coordinates are not serializable (same restriction NetCDF
has) — callers run ``space_coord_to_level_lat_lon`` first, exactly as
the reference does before saving (era5_svd.py:425).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import h5py
import numpy as np

from dmd_era5_tpu.utils.labels import Coord, Field, FieldSet

__all__ = ["save_fieldset", "load_fieldset"]

_TIME_UNIT = "nanoseconds since 1970-01-01"


def _encode_attr(value: Any):
    if isinstance(value, (list, tuple)):
        if all(isinstance(v, str) for v in value):
            return np.asarray(value, dtype=h5py.string_dtype())
        return np.asarray(value)
    if isinstance(value, bool):
        return int(value)
    if value is None:
        return "__none__"
    if isinstance(value, dict):
        return "__json__" + json.dumps(value)
    return value


def _decode_attr(value: Any):
    if isinstance(value, bytes):
        value = value.decode()
    if isinstance(value, str):
        if value == "__none__":
            return None
        if value.startswith("__json__"):
            return json.loads(value[len("__json__") :])
        return value
    if isinstance(value, np.ndarray):
        if value.dtype.kind in ("S", "O") or h5py.check_string_dtype(value.dtype):
            return [v.decode() if isinstance(v, bytes) else str(v) for v in value]
        return value
    if isinstance(value, np.generic):
        return value.item()
    return value


def _encode_array(values: np.ndarray) -> tuple[np.ndarray, dict]:
    meta: dict[str, Any] = {}
    if values.dtype.kind == "M":  # datetime64
        meta["units"] = _TIME_UNIT
        return values.astype("datetime64[ns]").astype(np.int64), meta
    if values.dtype.kind in ("U", "O"):
        return np.asarray(
            [str(v) for v in values.ravel()], dtype=h5py.string_dtype()
        ).reshape(values.shape), meta
    return values, meta


def _decode_array(ds: h5py.Dataset) -> np.ndarray:
    values = ds[()]
    if ds.attrs.get("units") == _TIME_UNIT or (
        isinstance(ds.attrs.get("units"), bytes)
        and ds.attrs["units"].decode() == _TIME_UNIT
    ):
        return values.astype("datetime64[ns]")
    if h5py.check_string_dtype(ds.dtype):
        return np.asarray(
            [v.decode() if isinstance(v, bytes) else v for v in values.ravel()],
            dtype=object,
        ).reshape(values.shape)
    return values


def save_fieldset(fs: FieldSet, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        for key, value in fs.attrs.items():
            f.attrs[key] = _encode_attr(value)
        vars_grp = f.create_group("vars")
        coords_grp = f.create_group("coords")
        written_coords: dict[str, Coord] = {}
        for name, field in fs.data_vars.items():
            arr, meta = _encode_array(np.asarray(field.data))
            ds = vars_grp.create_dataset(name, data=arr)
            ds.attrs["dims"] = np.asarray(field.dims, dtype=h5py.string_dtype())
            for k, v in meta.items():
                ds.attrs[k] = v
            for k, v in field.attrs.items():
                ds.attrs[f"attr_{k}"] = _encode_attr(v)
            for cname, coord in field.coords.items():
                if cname in written_coords:
                    if not (written_coords[cname] == coord):
                        raise ValueError(
                            f"Inconsistent coord {cname!r} across fields"
                        )
                    continue
                written_coords[cname] = coord
                carr, cmeta = _encode_array(np.asarray(coord.values))
                cds = coords_grp.create_dataset(cname, data=carr)
                cds.attrs["dims"] = np.asarray(
                    coord.dims, dtype=h5py.string_dtype()
                )
                for k, v in cmeta.items():
                    cds.attrs[k] = v


def load_fieldset(path: str | Path) -> FieldSet:
    with h5py.File(path, "r") as f:
        attrs = {k: _decode_attr(v) for k, v in f.attrs.items()}
        coords: dict[str, Coord] = {}
        for cname, cds in f["coords"].items():
            dims = tuple(d.decode() if isinstance(d, bytes) else d
                         for d in cds.attrs["dims"])
            coords[cname] = Coord(dims, _decode_array(cds))
        data_vars: dict[str, Field] = {}
        for name, ds in f["vars"].items():
            dims = tuple(d.decode() if isinstance(d, bytes) else d
                         for d in ds.attrs["dims"])
            field_attrs = {
                k[len("attr_") :]: _decode_attr(v)
                for k, v in ds.attrs.items()
                if k.startswith("attr_")
            }
            field_coords = {
                cname: coord
                for cname, coord in coords.items()
                if all(d in dims for d in coord.dims)
            }
            data_vars[name] = Field(
                _decode_array(ds), dims, field_coords, field_attrs, name
            )
    return FieldSet(data_vars, attrs=attrs)
