"""Expert-parallel batched decompositions.

The EP analogue mandated by the component inventory (SURVEY.md section
2b): independent decompositions — one per (variable, level) pair — are
routed as a batch over the mesh's ``data`` axis, so a pod slice fits
many small DMD problems concurrently while each problem's GEMMs still
shard over ``space``/``time``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dmd_era5_tpu.parallel.mesh import AXIS_DATA, make_mesh
from dmd_era5_tpu.pipeline.train_step import FitState, make_fit_step
from dmd_era5_tpu.utils.labels import FieldSet

__all__ = ["EnsembleFit", "fit_per_variable_level"]


class EnsembleFit(NamedTuple):
    """Batched fit results with per-entry labels.

    labels: list of (variable, level) for each batch row (padding rows
        excluded).
    state:  FitState with leading batch dim == len(labels).
    dmd:    per-member optimized-DMD solves (BatchedOptDMDResult) when
        ``solve_dmd=True`` — eigenvalues/modes/amplitudes per
        (variable, level), all from ONE vmapped LM; None otherwise.
    """

    labels: list[tuple[str, int]]
    state: FitState
    dmd: object | None = None


def fit_per_variable_level(
    fs: FieldSet,
    n_components: int,
    mesh: Mesh | None = None,
    n_oversamples: int = 10,
    seed: int = 0,
    gemm_dtype=jnp.float32,
    solve_dmd: bool = False,
    dmd_rank: int | None = None,
    dmd_max_iter: int = 50,
) -> EnsembleFit:
    """Fit one decomposition per (variable, level), batched over ``data``.

    Each batch entry is the (lat*lon, time) snapshot matrix of one
    variable at one pressure level — the reference runs these as
    separate pipeline invocations (README.md:85,139 implies one optDMD
    per configured slice); here they are one jit call on the mesh with
    dp/ep batching, and ``solve_dmd=True`` carries every member through
    the varpro solver in one vmapped LM
    (models.optdmd.optdmd_from_svd_batched).
    """
    mesh = mesh or make_mesh()
    levels = np.asarray(fs.coord("level").values)
    matrices = []
    labels: list[tuple[str, int]] = []
    for var in fs.variables:
        field = fs[var].transpose("time", "level", "latitude", "longitude")
        arr = np.asarray(field.data, dtype=np.float32)
        n_time = arr.shape[0]
        for li, lev in enumerate(levels):
            matrices.append(arr[:, li].reshape(n_time, -1).T)  # (S, T)
            labels.append((var, int(lev)))

    x = np.stack(matrices)  # (B, S, T)
    n_real = x.shape[0]
    data_size = mesh.shape[AXIS_DATA]
    pad = (-n_real) % data_size
    if pad:
        x = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0
        )

    sketch = n_components + n_oversamples
    omega = jax.random.normal(
        jax.random.key(seed), (x.shape[-1], sketch), dtype=jnp.float32
    )
    step = make_fit_step(mesh, n_components=n_components, gemm_dtype=gemm_dtype)
    state = step(jnp.asarray(x), omega)

    trimmed = FitState(
        u=state.u[:n_real],
        s=state.s[:n_real],
        v=state.v[:n_real],
        a_red=state.a_red[:n_real],
        loss=state.loss,
    )

    dmd = None
    if solve_dmd:
        from dmd_era5_tpu.models.optdmd import optdmd_from_svd_batched
        from dmd_era5_tpu.pipeline.era5_dmd import _hours_since_start

        t_hours = _hours_since_start(np.asarray(fs.coord("time").values))
        dmd = optdmd_from_svd_batched(
            trimmed.u,
            trimmed.s,
            trimmed.v,
            jnp.asarray(t_hours),
            rank=dmd_rank,
            max_iter=dmd_max_iter,
        )
    return EnsembleFit(labels, trimmed, dmd)
