"""Checkpoint/resume: pytree store + resumable variable projection."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from dmd_era5_tpu.models.optdmd import varpro_lm, varpro_lm_checkpointed
from dmd_era5_tpu.utils.checkpoint import load_pytree, save_pytree


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3), "b": (jnp.float32(1.5), jnp.ones(4))}
    path = tmp_path / "ckpt.h5"
    save_pytree(path, tree, metadata={"step": 7})
    back, meta = load_pytree(path, like=tree)
    assert meta == {"step": 7}
    np.testing.assert_array_equal(back["a"], np.arange(6).reshape(2, 3))
    np.testing.assert_array_equal(back["b"][1], np.ones(4))


def _lm_problem(rng):
    alpha_true = np.array([-0.1 + 1.5j, -0.1 - 1.5j], dtype=np.complex64)
    t = np.arange(48, dtype=np.float32) * 0.1
    b_true = (rng.standard_normal((2, 6)) + 1j * rng.standard_normal((2, 6))).astype(
        np.complex64
    )
    h = np.exp(np.outer(t, alpha_true)) @ b_true
    h = h + 0.001 * (
        rng.standard_normal(h.shape) + 1j * rng.standard_normal(h.shape)
    ).astype(np.complex64)
    alpha0 = alpha_true * (1 + 0.05) + 0.02j
    return jnp.asarray(h), jnp.asarray(t), jnp.asarray(alpha0), alpha_true


def test_checkpointed_matches_direct(tmp_path, rng):
    h, t, alpha0, alpha_true = _lm_problem(rng)
    a_direct, _, rel_direct, n_direct = varpro_lm(h, t, alpha0, max_iter=30)
    a_ck, _, rel_ck, n_ck = varpro_lm_checkpointed(
        h, t, alpha0, str(tmp_path / "lm.h5"), max_iter=30, chunk_iters=5
    )
    np.testing.assert_allclose(
        np.asarray(a_ck), np.asarray(a_direct), atol=1e-4
    )
    assert abs(float(rel_ck) - float(rel_direct)) < 1e-5


def test_checkpointed_resumes_from_file(tmp_path, rng):
    """Simulate a crash: run a few chunks, then restart from the same
    checkpoint path and confirm it continues rather than restarting."""
    h, t, alpha0, alpha_true = _lm_problem(rng)
    path = str(tmp_path / "lm.h5")
    # first run capped early — leaves a mid-solve checkpoint
    varpro_lm_checkpointed(h, t, alpha0, path, max_iter=4, chunk_iters=2)
    state, meta = load_pytree(
        path,
        like=(
            jnp.zeros(4, jnp.float32),
            jnp.float32(0),
            jnp.float32(0),
            jnp.int32(0),
            jnp.bool_(False),
        ),
    )
    assert meta["iteration"] >= 1
    # resume to convergence
    a_res, _, rel_res, n_res = varpro_lm_checkpointed(
        h, t, alpha0, path, max_iter=40, chunk_iters=10
    )
    assert int(n_res) >= meta["iteration"]
    # recovers the true eigenvalues
    found = sorted(np.asarray(a_res), key=lambda z: z.imag)
    true = sorted(alpha_true, key=lambda z: z.imag)
    np.testing.assert_allclose(found, true, atol=5e-3)


def test_lstsq_implicit_jvp_matches_autodiff(rng):
    """The implicit-differentiation rule must agree with differentiating
    straight through the normal-equations solve."""
    import jax
    import jax.numpy as jnp

    from dmd_era5_tpu.utils.linalg import complex_lstsq, lstsq_implicit

    t, r, k = 20, 3, 4
    tt = np.arange(t, dtype=np.float32) * 0.1
    h = jnp.asarray(
        (rng.standard_normal((t, k)) + 1j * rng.standard_normal((t, k))).astype(
            np.complex64
        )
    )
    alpha = jnp.asarray(
        np.array([-0.1 + 1.0j, -0.2 - 0.5j, -0.05 + 2.0j], dtype=np.complex64)
    )

    def b_of_theta_implicit(theta):
        a = theta[:r] + 1j * theta[r:]
        phi = jnp.exp(jnp.outer(jnp.asarray(tt), a))
        b = lstsq_implicit(phi, h, 0.0)
        return jnp.concatenate([jnp.real(b).ravel(), jnp.imag(b).ravel()])

    def b_of_theta_direct(theta):
        a = theta[:r] + 1j * theta[r:]
        phi = jnp.exp(jnp.outer(jnp.asarray(tt), a))
        b = complex_lstsq(phi, h)
        return jnp.concatenate([jnp.real(b).ravel(), jnp.imag(b).ravel()])

    theta = jnp.concatenate([jnp.real(alpha), jnp.imag(alpha)])
    j_implicit = jax.jacfwd(b_of_theta_implicit)(theta)
    j_direct = jax.jacfwd(b_of_theta_direct)(theta)
    np.testing.assert_allclose(
        np.asarray(j_implicit), np.asarray(j_direct), rtol=1e-3, atol=1e-4
    )
