"""Field/FieldSet container semantics."""

from __future__ import annotations

import numpy as np
import pytest

from dmd_era5_tpu.utils import Coord, Field, FieldSet


def make_field(rng):
    data = rng.standard_normal((4, 3, 2))
    return Field(
        data,
        dims=("time", "level", "latitude"),
        coords={
            "time": np.arange(4),
            "level": np.array([1000, 850, 500]),
            "latitude": np.array([10.0, -10.0]),
        },
        name="t",
    )


def test_field_shape_validation(rng):
    with pytest.raises(ValueError, match="dims"):
        Field(rng.standard_normal((3, 2)), dims=("a",))


def test_coord_shape_validation(rng):
    with pytest.raises(ValueError, match="shape"):
        Field(
            rng.standard_normal((3, 2)),
            dims=("a", "b"),
            coords={"a": np.arange(5)},
        )


def test_isel_int_drops_dim(rng):
    f = make_field(rng)
    g = f.isel(level=1)
    assert g.dims == ("time", "latitude")
    assert g.shape == (4, 2)
    assert "level" not in g.coords
    np.testing.assert_array_equal(g.values, f.values[:, 1, :])


def test_isel_array_keeps_dim(rng):
    f = make_field(rng)
    g = f.isel(time=np.array([0, 2]))
    assert g.sizes["time"] == 2
    np.testing.assert_array_equal(g.coords["time"].values, [0, 2])


def test_transpose(rng):
    f = make_field(rng)
    g = f.transpose("level", "latitude", "time")
    assert g.dims == ("level", "latitude", "time")
    np.testing.assert_array_equal(g.values, f.values.transpose(1, 2, 0))


def test_mean_std_reduce(rng):
    f = make_field(rng)
    m = f.mean("time")
    assert m.dims == ("level", "latitude")
    np.testing.assert_allclose(m.values, f.values.mean(axis=0))
    s = f.std("time")
    np.testing.assert_allclose(s.values, f.values.std(axis=0))


def test_broadcast_subtract(rng):
    f = make_field(rng)
    m = f.mean("time")
    centered = f - m
    assert centered.dims == f.dims
    np.testing.assert_allclose(
        centered.values, f.values - f.values.mean(axis=0, keepdims=True)
    )
    np.testing.assert_allclose(centered.mean("time").values, 0.0, atol=1e-12)


def test_fieldset_ops(rng):
    f = make_field(rng)
    fs = FieldSet({"t": f}, attrs={"k": 1})
    fs2 = fs - fs.mean("time")
    np.testing.assert_allclose(fs2["t"].mean("time").values, 0.0, atol=1e-12)
    sub = fs[["t"]]
    assert isinstance(sub, FieldSet)
    assert sub.variables == ["t"]


def test_fieldset_coord_lookup(rng):
    f = make_field(rng)
    fs = FieldSet({"t": f})
    assert isinstance(fs.coord("level"), Coord)
    with pytest.raises(KeyError):
        fs.coord("nope")


def test_field_jax_data_stays_jax(rng):
    import jax.numpy as jnp

    f = Field(jnp.ones((2, 3)), dims=("a", "b"))
    g = f.mean("a")
    assert isinstance(g.data, jnp.ndarray)
    h = f - g
    assert isinstance(h.data, jnp.ndarray)
