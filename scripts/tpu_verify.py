"""On-hardware verification: oracle parity checks on the real TPU chip.

The pytest suite runs on the virtual CPU mesh; this script re-runs the
condensed oracle matrix on actual TPU hardware (north-star acceptance:
eigenvalues / modes / singular triplets allclose to the reference
pipeline on TPU).  Prints one PASS/FAIL line per check and exits
nonzero on any failure.

Usage: python scripts/tpu_verify.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    return ok


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    results = []

    # ---- exact truncated SVD vs numpy -------------------------------
    from dmd_era5_tpu.ops import exact_truncated_svd, randomized_svd

    s_dim, t_dim, k = 4096, 96, 12
    a = rng.standard_normal((s_dim, 16))
    b = rng.standard_normal((16, t_dim))
    x = (a * np.logspace(0, -2, 16)) @ b + 1e-4 * rng.standard_normal(
        (s_dim, t_dim)
    )
    x = x.astype(np.float32)
    res = exact_truncated_svd(jnp.asarray(x), k)
    u_np, s_np, vt_np = np.linalg.svd(x, full_matrices=False)
    s_err = float(
        np.abs(np.asarray(res.s) - s_np[:k]).max() / s_np[0]
    )
    results.append(check("exact SVD singular values", s_err < 1e-3, f"rel err {s_err:.2e}"))
    # subspace angle of U
    qa, _ = np.linalg.qr(np.asarray(res.U))
    qb, _ = np.linalg.qr(u_np[:, :k])
    ang = 1 - np.linalg.svd(qa.T @ qb, compute_uv=False).min()
    results.append(check("exact SVD left subspace", ang < 1e-3, f"angle err {ang:.2e}"))

    # ---- Gram-route exact SVD (production standard path) ------------
    from dmd_era5_tpu.ops import truncated_svd

    res_g = truncated_svd(jnp.asarray(x), k, svd_type="standard")
    sg_err = float(np.abs(np.asarray(res_g.s) - s_np[:k]).max() / s_np[0])
    results.append(
        check(
            "exact SVD Gram route (bf16_split)",
            sg_err < 1e-3,
            f"rel err {sg_err:.2e}",
        )
    )

    # ---- randomized SVD vs sklearn semantics ------------------------
    from sklearn.utils.extmath import randomized_svd as sk_rsvd

    res_r = randomized_svd(jnp.asarray(x), k, seed=0)
    u_sk, s_sk, v_sk = sk_rsvd(x, n_components=k, random_state=0)
    rel = float(np.abs(np.asarray(res_r.s) - s_sk).max() / s_sk[0])
    results.append(
        check("randomized SVD vs sklearn", rel < 1e-2, f"s rel err {rel:.2e}")
    )
    ours = np.linalg.norm(
        x - np.asarray(res_r.U) @ np.diag(np.asarray(res_r.s)) @ np.asarray(res_r.V)
    )
    theirs = np.linalg.norm(x - u_sk @ np.diag(s_sk) @ v_sk)
    results.append(
        check(
            "randomized SVD reconstruction",
            ours <= theirs * 1.05,
            f"ours {ours:.4f} vs sklearn {theirs:.4f}",
        )
    )

    # ---- Hankel operator path == materialized path ------------------
    from dmd_era5_tpu.ops.hankel import hankel_randomized_svd
    from dmd_era5_tpu.snapmat import delay_embed_np

    d = 3
    xh = rng.standard_normal((512, 64)).astype(np.float32)
    res_op = hankel_randomized_svd(jnp.asarray(xh), d, 8, seed=5)
    res_mat = randomized_svd(jnp.asarray(delay_embed_np(xh, d)), 8, seed=5)
    herr = float(np.abs(np.asarray(res_op.s) - np.asarray(res_mat.s)).max())
    results.append(
        check("Hankel operator SVD == materialized", herr < 1e-2, f"max err {herr:.2e}")
    )

    # ---- exact Hankel-operator SVD (banded raw-Gram path) -----------
    from dmd_era5_tpu.ops.hankel import hankel_exact_svd

    s_h = np.linalg.svd(
        delay_embed_np(xh, d).astype(np.float64), compute_uv=False
    )
    res_ex = hankel_exact_svd(jnp.asarray(xh), d, 8)
    exerr = float(np.abs(np.asarray(res_ex.s) - s_h[:8]).max() / s_h[0])
    results.append(
        check(
            "exact Hankel SVD vs materialized numpy",
            exerr < 1e-4,
            f"s rel err {exerr:.2e}",
        )
    )

    # ---- optDMD eigenvalue recovery ---------------------------------
    from dmd_era5_tpu.models import fit_optdmd

    alpha_true = np.array(
        [-0.05 + 2.1j, -0.05 - 2.1j, -0.3 + 0.7j, -0.3 - 0.7j], np.complex64
    )
    t = (np.arange(64) * 0.1).astype(np.float32)
    base = rng.standard_normal((256, 2)) + 1j * rng.standard_normal((256, 2))
    modes = np.stack(
        [base[:, 0], base[:, 0].conj(), base[:, 1], base[:, 1].conj()], axis=1
    )
    amps = np.array([1, 1, 0.5, 0.5], np.complex64)
    xd = ((modes * amps) @ np.exp(np.outer(alpha_true, t))).real.astype(np.float32)
    fit = fit_optdmd(jnp.asarray(xd), jnp.asarray(t), rank=4)
    found = sorted(np.asarray(fit.alpha), key=lambda z: (round(z.imag, 1), z.real))
    true_sorted = sorted(alpha_true, key=lambda z: (round(z.imag, 1), z.real))
    eig_err = max(abs(f - tv) for f, tv in zip(found, true_sorted))
    results.append(
        check("optDMD eigenvalue recovery", eig_err < 1e-2, f"max |err| {eig_err:.2e}")
    )
    results.append(
        check(
            "optDMD residual", float(fit.residual) < 1e-3,
            f"rel residual {float(fit.residual):.2e}",
        )
    )

    # ---- mock-ERA5 end-to-end oracle (north-star config 1) ----------
    from dmd_era5_tpu.snapmat import create_mock_era5_svd

    U, S, V, coords, X = create_mock_era5_svd(
        "2020-01-01", "2020-01-02", delay_embedding=2, n_components=10, seed=42
    )
    xm = np.asarray(X.data, dtype=np.float32)
    res_m = exact_truncated_svd(jnp.asarray(xm), 10)
    merr = float(np.abs(np.asarray(res_m.s) - S).max() / S[0])
    results.append(
        check("mock-ERA5 pipeline oracle", merr < 1e-3, f"s rel err {merr:.2e}")
    )

    # ---- fused fit step loss == oracle ------------------------------
    from dmd_era5_tpu.pipeline.train_step import fit_step_fused

    omega = jnp.asarray(rng.standard_normal((t_dim, 22)).astype(np.float32))
    state = fit_step_fused(jnp.asarray(x), omega, n_components=12)
    xc = x - x.mean(axis=1, keepdims=True)
    y_o = xc @ np.asarray(omega)
    q_o, _ = np.linalg.qr(y_o)
    b_o = q_o.T @ xc
    s_o = np.linalg.svd(b_o, compute_uv=False)[:12]
    loss_o = np.sqrt(
        max(np.linalg.norm(xc) ** 2 - np.sum(s_o**2), 0)
    ) / np.linalg.norm(xc)
    ferr = abs(float(state.loss) - loss_o)
    results.append(
        check("fused fit step loss", ferr < 1e-3, f"|delta| {ferr:.2e}")
    )

    # ---- stats-from-sketch variant: exact row stats on the MXU ------
    st2 = fit_step_fused(
        jnp.asarray(x), omega, n_components=12, stats_from_sketch=True
    )
    s2err = abs(float(st2.loss) - loss_o)
    # kernel-level stats against numpy (Mosaic path, not interpret)
    from dmd_era5_tpu.ops.matmul import sketch_center_gram_project

    _, rs_k, rss_k, _, _ = sketch_center_gram_project(
        jnp.asarray(x), omega, stats_col=True
    )
    rs_err = float(
        np.abs(np.asarray(rs_k) - x.sum(axis=1)).max()
        / max(np.abs(x.sum(axis=1)).max(), 1e-9)
    )
    results.append(
        check(
            "stats-from-sketch fit step",
            s2err < 3e-3 and rs_err < 1e-4,
            f"loss delta {s2err:.2e}, rowsum rel err {rs_err:.2e}",
        )
    )

    # ---- BOP-DMD: bagged trials recover the spectrum with tight std -
    from dmd_era5_tpu.models.bopdmd import bopdmd_from_svd

    alpha_b = np.array([-0.02 + 1.3j, -0.02 - 1.3j], np.complex64)
    t_b = (np.arange(128) * 0.1).astype(np.float32)
    base_b = rng.standard_normal((512, 1)) + 1j * rng.standard_normal((512, 1))
    modes_b = np.concatenate([base_b, base_b.conj()], axis=1)
    xb = (modes_b @ np.exp(np.outer(alpha_b, t_b))).real.astype(np.float32)
    xb += 0.001 * rng.standard_normal(xb.shape).astype(np.float32)
    ub, sb, vbt = np.linalg.svd(xb, full_matrices=False)
    bop = bopdmd_from_svd(
        jnp.asarray(ub[:, :4]), jnp.asarray(sb[:4]), jnp.asarray(vbt[:4]),
        jnp.asarray(t_b), rank=2, n_trials=8, max_iter=30,
    )
    freq_got = np.sort(np.abs(np.asarray(bop.eigenvalues).imag))
    freq_err = float(np.abs(freq_got - 1.3).max())
    std_ok = float(np.abs(np.asarray(bop.eigenvalues_std)).max())
    results.append(
        check(
            "BOP-DMD bagged spectrum + trial std",
            freq_err < 1e-2 and std_ok < 0.05,
            f"freq err {freq_err:.2e}, max trial std {std_ok:.2e}",
        )
    )

    # ---- mrDMD: level residual decays on a two-scale signal ---------
    from dmd_era5_tpu.models.mrdmd import fit_mrdmd, mrdmd_reconstruct

    t_m = np.arange(128, dtype=np.float64)
    q_m, _ = np.linalg.qr(rng.standard_normal((256, 4)))
    xm2 = (
        np.outer(q_m[:, 0], np.cos(0.05 * t_m))
        + np.outer(q_m[:, 1], np.sin(0.05 * t_m))
        + 0.5 * np.outer(q_m[:, 2], np.cos(1.1 * t_m))
        + 0.5 * np.outer(q_m[:, 3], np.sin(1.1 * t_m))
    ).astype(np.float32)
    mr = fit_mrdmd(jnp.asarray(xm2), rank=4, max_levels=3, max_cycles=2.0)
    rec_err = float(
        np.linalg.norm(mrdmd_reconstruct(mr) + mr.residual - xm2[:, : mr.t_used])
        / np.linalg.norm(xm2[:, : mr.t_used])
    )
    res_frac = float(np.linalg.norm(mr.residual) / np.linalg.norm(xm2))
    results.append(
        check(
            "mrDMD identity + residual decay",
            rec_err < 1e-4 and res_frac < 0.1,
            f"identity err {rec_err:.2e}, residual frac {res_frac:.2e}",
        )
    )

    # ---- DMDc: forced-trajectory recovery ---------------------------
    from dmd_era5_tpu.models.dmdc import dmdc_rollout, fit_dmdc

    u_true, _ = np.linalg.qr(rng.standard_normal((512, 4)))
    th1, th2 = 0.3, 1.1
    a0 = np.zeros((4, 4))
    for i0, (th, g) in enumerate(((th1, 0.98), (th2, 0.9))):
        c, s_ = np.cos(th) * g, np.sin(th) * g
        a0[2 * i0 : 2 * i0 + 2, 2 * i0 : 2 * i0 + 2] = [[c, -s_], [s_, c]]
    b0 = rng.standard_normal((4, 2))
    u_seq = rng.standard_normal((2, 119)).astype(np.float32)
    xdc = np.zeros((512, 120), np.float32)
    zdc = rng.standard_normal(4)
    xdc[:, 0] = u_true @ zdc
    for kk in range(119):
        zdc = a0 @ zdc + b0 @ u_seq[:, kk]
        xdc[:, kk + 1] = u_true @ zdc
    resc = fit_dmdc(jnp.asarray(xdc), jnp.asarray(u_seq), rank=4)
    lam_err = float(
        np.abs(
            np.sort_complex(resc.eigenvalues.astype(np.complex128))
            - np.sort_complex(np.linalg.eigvals(a0))
        ).max()
    )
    xr = np.asarray(dmdc_rollout(resc, xdc[:, 0], jnp.asarray(u_seq)))
    traj_err = float(np.linalg.norm(xr - xdc) / np.linalg.norm(xdc))
    results.append(
        check(
            "DMDc forced-trajectory recovery",
            lam_err < 5e-3 and traj_err < 5e-3,
            f"eig err {lam_err:.2e}, rollout err {traj_err:.2e}",
        )
    )

    n_fail = sum(not r for r in results)
    print(f"\n{len(results) - n_fail}/{len(results)} checks passed")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
