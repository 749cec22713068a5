"""Forecast / reconstruction rollout.

X^(t) = Phi diag(b) exp(alpha t): one skinny (S, r) x (r, T') GEMM,
row-sharded over space — the component absent from the reference
(SURVEY.md section 2b, "Forecast/reconstruction rollout").

Handles the inverse preprocessing chain: undo standardization (multiply
by std, add mean) and strip the delay-embedding copies (keep the
delay = 0 block, the undelayed rows — reference coordinate convention at
/root/reference/src/dmd_era5/slice_tools/slice_tools.py:255-274).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from dmd_era5_tpu.models.dmd import DMDResult
from dmd_era5_tpu.models.optdmd import OptDMDResult

HIGHEST = lax.Precision.HIGHEST

__all__ = ["rollout", "forecast_times", "undo_preprocessing"]


def rollout(
    result: DMDResult | OptDMDResult,
    t,
) -> jax.Array:
    """Evaluate the fitted linear model at times ``t`` (seconds/hours —
    whatever unit the fit used).  Returns real (S, len(t)).

    Complex arithmetic is kept off the device transfer path (unsupported
    on some TPU backends): the small complex dynamics matrix is built on
    host, and the S-sized contraction Re(M D) = M_re D_re - M_im D_im
    runs as two real device GEMMs.
    """
    import numpy as np

    if isinstance(result, DMDResult):
        alpha = np.asarray(jax.device_get(result.omega))
        scale = np.asarray(jax.device_get(result.amplitudes))
    else:
        alpha = np.asarray(jax.device_get(result.alpha))
        scale = np.asarray(jax.device_get(result.amplitudes))
    modes = np.asarray(jax.device_get(result.modes))
    t_host = np.asarray(jax.device_get(t), dtype=np.float64)

    dynamics = scale[:, None] * np.exp(np.outer(alpha, t_host))  # (r, T')
    m_re = jnp.asarray(modes.real.astype(np.float32))
    m_im = jnp.asarray(modes.imag.astype(np.float32))
    d_re = jnp.asarray(dynamics.real.astype(np.float32))
    d_im = jnp.asarray(dynamics.imag.astype(np.float32))
    return jnp.matmul(m_re, d_re, precision=HIGHEST) - jnp.matmul(
        m_im, d_im, precision=HIGHEST
    )


def forecast_times(n_history: int, n_future: int, dt: float) -> jax.Array:
    """Times covering the training window plus ``n_future`` extra steps."""
    return jnp.arange(n_history + n_future) * dt


def undo_preprocessing(
    x: jax.Array,
    mean: jax.Array | None = None,
    std: jax.Array | None = None,
    delay: int = 1,
) -> jax.Array:
    """Invert standardize + delay-embed on reconstructed snapshots.

    Args:
        x: (S * delay, T') reconstructed embedded snapshots.
        mean/std: (S * delay,) per-row statistics (already tiled across
            delay blocks by the pipeline, matching era5_svd.py:400-414).
        delay: embedding depth d; the last block (delay coordinate 0,
            i.e. the undelayed rows) is returned.
    """
    if std is not None:
        x = x * std[:, None]
    if mean is not None:
        x = x + mean[:, None]
    if delay > 1:
        s = x.shape[0] // delay
        x = x[(delay - 1) * s :, :]
    return x
