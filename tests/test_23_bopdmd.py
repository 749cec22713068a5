"""BOP-DMD: bagged optimized DMD with uncertainty quantification."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmd_era5_tpu.models import bopdmd_from_svd, fit_bopdmd
from dmd_era5_tpu.models.optdmd import varpro_lm, varpro_lm_batched

# column order pairs each mode with ITS conjugate eigenvalue below —
# mispairing collapses the spatial span to rank 2
TRUE_ALPHAS = np.array([-0.10 + 2.0j, -0.50 + 0.7j, -0.10 - 2.0j, -0.50 - 0.7j])


def _oscillator_data(s_rows=96, t_cols=160, noise=0.01, seed=0):
    """Real (S, T) snapshots from two decaying complex-conjugate modes."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 6.0, t_cols).astype(np.float32)
    w = rng.standard_normal((s_rows, 2)) + 1j * rng.standard_normal((s_rows, 2))
    modes = np.concatenate([w, np.conj(w)], axis=1)  # (S, 4): w1 w2 w1* w2*
    sig = np.exp(np.outer(TRUE_ALPHAS, t))  # (4, T): a1 a2 a1* a2*
    x = np.real(modes @ sig) + noise * rng.standard_normal((s_rows, t_cols))
    return x.astype(np.float32), t


class TestPerMemberTimes:
    def test_batched_lm_matches_loop_with_distinct_times(self):
        """varpro_lm_batched with (B, T) sample times == per-member calls."""
        x, t = _oscillator_data()
        rng = np.random.default_rng(1)
        u, s, vt = np.linalg.svd(x, full_matrices=False)
        z = (s[:4, None] * vt[:4]).astype(np.float32)  # (k, T) projected
        h = z.T  # (T, k)
        idx = np.stack(
            [np.sort(rng.choice(len(t), size=120, replace=False)) for _ in range(3)]
        )
        h_b = h[idx]
        t_b = t[idx]
        alpha0 = np.tile(TRUE_ALPHAS[None, :] * 1.1, (3, 1)).astype(np.complex64)
        a_batch, b_batch, _, _ = varpro_lm_batched(
            h_b, t_b, alpha0, max_iter=30
        )
        for i in range(3):
            a_i, b_i, _, _ = varpro_lm(h_b[i], t_b[i], alpha0[i], max_iter=30)
            np.testing.assert_allclose(
                np.sort_complex(a_batch[i]), np.sort_complex(a_i), atol=1e-4
            )


class TestBOPDMD:
    @pytest.fixture(scope="class")
    def result(self):
        x, t = _oscillator_data()
        return fit_bopdmd(
            jnp.asarray(x), jnp.asarray(t), rank=4, n_trials=12,
            trial_fraction=0.7, seed=3, max_iter=40,
        ), x, t

    def test_mean_eigenvalues_recover_truth(self, result):
        res, _, _ = result
        got = np.sort_complex(res.eigenvalues)
        want = np.sort_complex(TRUE_ALPHAS.astype(np.complex64))
        np.testing.assert_allclose(got, want, atol=0.05)

    def test_uncertainties_are_small_and_positive(self, result):
        res, _, _ = result
        assert res.eigenvalues_std.shape == (4,)
        assert np.all(res.eigenvalues_std >= 0)
        # clean synthetic data: trial scatter well under the eigenvalue scale
        assert np.all(res.eigenvalues_std < 0.2)
        assert res.modes_std.shape == res.modes.shape
        assert np.all(np.isfinite(res.modes_std))
        assert np.all(res.amplitudes_std >= 0)

    def test_trials_are_aligned_to_anchor(self, result):
        res, _, _ = result
        # after alignment every trial's slot-j eigenvalue is near the
        # full fit's slot-j eigenvalue — no mode mixing across slots
        spread = np.abs(res.trial_eigenvalues - res.full.alpha[None, :])
        assert spread.max() < 0.3

    def test_mean_modes_span_truth(self, result):
        res, x, _ = result
        # subspace check: each mean mode lies in the span of the true
        # modes (via the projector built from an exact SVD of clean data)
        u, _, _ = np.linalg.svd(x, full_matrices=False)
        basis = u[:, :4]
        proj = basis @ (basis.conj().T @ res.modes)
        err = np.linalg.norm(proj - res.modes, axis=0)
        assert np.all(err < 0.05)

    def test_bagging_reduces_variance_vs_noise(self):
        """More noise => larger reported eigenvalue uncertainty."""
        x_lo, t = _oscillator_data(noise=0.005, seed=5)
        x_hi, _ = _oscillator_data(noise=0.25, seed=5)
        kw = dict(rank=4, n_trials=10, trial_fraction=0.7, seed=7, max_iter=30)
        r_lo = fit_bopdmd(jnp.asarray(x_lo), jnp.asarray(t), **kw)
        r_hi = fit_bopdmd(jnp.asarray(x_hi), jnp.asarray(t), **kw)
        assert r_hi.eigenvalues_std.mean() > r_lo.eigenvalues_std.mean()

    def test_validation(self):
        x, t = _oscillator_data(t_cols=40)
        with pytest.raises(ValueError, match="trial_fraction"):
            fit_bopdmd(jnp.asarray(x), jnp.asarray(t), rank=4, trial_fraction=0.0)

    def test_from_svd_entry(self):
        x, t = _oscillator_data()
        u, s, vt = np.linalg.svd(x, full_matrices=False)
        res = bopdmd_from_svd(
            jnp.asarray(u[:, :4].copy()),
            jnp.asarray(s[:4].copy()),
            jnp.asarray(vt[:4].copy()),
            jnp.asarray(t),
            n_trials=8,
            max_iter=30,
        )
        got = np.sort_complex(res.eigenvalues)
        want = np.sort_complex(TRUE_ALPHAS.astype(np.complex64))
        np.testing.assert_allclose(got, want, atol=0.05)


class TestEPSharding:
    def test_bag_sharded_over_data_axis_matches_unsharded(self):
        """EP-sharded bag (shard_map over data) == single-device bag,
        including a batch size that does not divide the axis."""
        from dmd_era5_tpu.parallel import make_mesh

        x, t = _oscillator_data()
        mesh = make_mesh("data=4,space=2")
        kw = dict(rank=4, n_trials=10, trial_fraction=0.7, seed=9, max_iter=30)
        r_plain = fit_bopdmd(jnp.asarray(x), jnp.asarray(t), **kw)
        r_shard = fit_bopdmd(jnp.asarray(x), jnp.asarray(t), mesh=mesh, **kw)
        np.testing.assert_allclose(
            np.sort_complex(r_shard.eigenvalues),
            np.sort_complex(r_plain.eigenvalues),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            r_shard.amplitudes, r_plain.amplitudes, rtol=1e-4
        )

    def test_sharded_bag_compiles_no_collectives(self):
        """Trials are independent: the EP-sharded LM must emit ZERO
        collectives (the comm-pattern guard for the bagging path)."""
        import re

        from dmd_era5_tpu.models.optdmd import _lm_core
        import functools

        from dmd_era5_tpu.parallel import make_mesh
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh("data=4,space=2")
        B, T, k, r = 8, 64, 4, 4
        rng = np.random.default_rng(0)
        core = functools.partial(
            _lm_core, max_iter=10, tol=1e-7, lambda_up=4.0,
            lambda_down=5.0, ridge=0.0,
        )
        vcore = jax.vmap(core, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))
        sharded = jax.shard_map(
            vcore,
            mesh=mesh,
            in_specs=(P("data"),) * 8,
            out_specs=P("data"),
            check_vma=False,
        )
        args = (
            jnp.asarray(rng.standard_normal((B, T, k)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, T, k)), jnp.float32),
            jnp.asarray(np.tile(np.linspace(0, 1, T, dtype=np.float32), (B, 1))),
            jnp.asarray(rng.standard_normal((B, 2 * r)), jnp.float32),
            jnp.ones((B,), jnp.float32),
            jnp.zeros((B,), jnp.float32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool),
        )
        hlo = jax.jit(sharded).lower(*args).compile().as_text()
        found = re.findall(
            r"\b(all-reduce|all-gather|all-to-all|reduce-scatter|"
            r"collective-permute)\b",
            hlo,
        )
        assert not found, f"unexpected collectives in EP bag: {found}"
