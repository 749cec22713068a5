"""Distributed TSQR + SVD vs. the numpy/sklearn oracle.

Strategy per SURVEY.md section 4/7: the single-host exact pipeline is
the allclose oracle; the randomized path is validated via subspace
angles and reconstruction error (bit-exact RNG parity with sklearn is
impossible by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmd_era5_tpu.ops import (
    exact_truncated_svd,
    qr_positive,
    randomized_svd,
    truncated_svd,
    tsqr,
)
from dmd_era5_tpu.parallel import make_mesh, shard_rows


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # 8 virtual CPU devices on the space axis


def lowrank_matrix(rng, s, t, rank, noise=1e-3):
    """Tall matrix with a controlled spectrum for truncation tests."""
    a = rng.standard_normal((s, rank))
    b = rng.standard_normal((rank, t))
    scales = np.logspace(0, -2, rank)
    x = (a * scales) @ b + noise * rng.standard_normal((s, t))
    return x.astype(np.float32)


def subspace_angle_err(A: np.ndarray, B: np.ndarray) -> float:
    """max principal angle (as 1 - min singular value of Qa^T Qb)."""
    qa, _ = np.linalg.qr(A)
    qb, _ = np.linalg.qr(B)
    sv = np.linalg.svd(qa.T @ qb, compute_uv=False)
    return float(1.0 - sv.min())


# ------------------------------------------------------------------ QR


def test_qr_positive_convention(rng):
    x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    q, r = qr_positive(x)
    assert np.all(np.diagonal(np.asarray(r)) >= 0)
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(x), atol=1e-5)


def test_tsqr_matches_host_qr(rng, mesh):
    x = rng.standard_normal((1024, 24)).astype(np.float32)
    xs, rows = shard_rows(x, mesh)
    q, r = tsqr(xs, mesh)
    q_host, r_host = qr_positive(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_host), atol=2e-4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_host), atol=2e-4)


def test_tsqr_orthonormal_and_exact(rng, mesh):
    x = rng.standard_normal((2048, 40)).astype(np.float32)
    xs, rows = shard_rows(x, mesh)
    q, r = tsqr(xs, mesh)
    qtq = np.asarray(q).T @ np.asarray(q)
    np.testing.assert_allclose(qtq, np.eye(40), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(q) @ np.asarray(r), x, atol=5e-4
    )


def test_tsqr_with_padding(rng, mesh):
    # 1003 rows does not divide 8 shards: zero-pad then verify.
    x = rng.standard_normal((1003, 16)).astype(np.float32)
    xs, rows = shard_rows(x, mesh)
    assert xs.shape[0] == 1003 + (8 - 1003 % 8)
    q, r = tsqr(xs, mesh)
    _, r_host = qr_positive(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_host), atol=2e-4)


def test_tsqr_tree_combine_uses_ppermute_not_allgather(rng, mesh):
    """The power-of-2 combine must be the ppermute butterfly ladder:
    log P rounds of pairwise (2rk, T) merges, O(log P * T^2) comm —
    no (P*rk, T) all-gather anywhere in the program."""
    x = rng.standard_normal((1024, 16)).astype(np.float32)
    xs, _ = shard_rows(x, mesh)
    lowered = jax.jit(lambda a: tsqr(a, mesh)).lower(xs).as_text()
    assert "collective_permute" in lowered
    assert "all_gather" not in lowered and "all-gather" not in lowered


@pytest.mark.parametrize("n_dev", [3, 5, 6, 7])
def test_tsqr_tree_combine_non_power_of_two(rng, n_dev):
    """Any-P tree combine (fold + butterfly + packed return): identical
    numerics to the host QR at every non-power-of-two axis size, and
    STILL no all-gather — the O(P) flat combine is gone."""
    devices = jax.devices()[:n_dev]
    mesh_np2 = make_mesh({"space": n_dev}, devices=devices)
    x = rng.standard_normal((996, 16)).astype(np.float32)
    xs, _ = shard_rows(x, mesh_np2)
    q, r = tsqr(xs, mesh_np2)
    q_host, r_host = qr_positive(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_host), atol=2e-4)
    np.testing.assert_allclose(np.asarray(q)[:996], np.asarray(q_host), atol=2e-4)
    lowered = jax.jit(lambda a: tsqr(a, mesh_np2)).lower(xs).as_text()
    assert "collective_permute" in lowered
    assert "all_gather" not in lowered and "all-gather" not in lowered


@pytest.mark.parametrize("n_dev", [6])
def test_tsqr_non_power_of_two_rank_doubling(rng, n_dev):
    """Non-power-of-two combine with leaf blocks shorter than T: the
    phantom-pad rank schedule must still deliver exact Q R = X."""
    devices = jax.devices()[:n_dev]
    mesh_np2 = make_mesh({"space": n_dev}, devices=devices)
    x = rng.standard_normal((96, 24)).astype(np.float32)  # m_loc = 16 < 24
    xs, _ = shard_rows(x, mesh_np2)
    q, r = tsqr(xs, mesh_np2)
    np.testing.assert_allclose(np.asarray(q) @ np.asarray(r), x, atol=5e-4)
    qtq = np.asarray(q).T @ np.asarray(q)
    np.testing.assert_allclose(qtq, np.eye(qtq.shape[0]), atol=5e-4)


def test_tsqr_tree_rank_doubling(rng, mesh):
    """Local blocks shorter than T (rk < T at the leaves): the merged
    rank doubles per ladder round until it caps at T."""
    x = rng.standard_normal((64, 24)).astype(np.float32)  # m_loc = 8 < 24
    xs, _ = shard_rows(x, mesh)
    q, r = tsqr(xs, mesh)
    assert np.asarray(r).shape == (24, 24)
    np.testing.assert_allclose(
        np.asarray(q) @ np.asarray(r), x, atol=5e-4
    )
    qtq = np.asarray(q).T @ np.asarray(q)
    np.testing.assert_allclose(qtq, np.eye(24), atol=5e-5)


# --------------------------------------------------------------- exact


@pytest.mark.parametrize("use_mesh", [False, True])
def test_exact_svd_matches_numpy(rng, mesh, use_mesh):
    x = lowrank_matrix(rng, 1024, 32, rank=12)
    k = 8
    if use_mesh:
        xs, _ = shard_rows(x, mesh)
        res = exact_truncated_svd(xs, k, mesh=mesh)
    else:
        res = exact_truncated_svd(jnp.asarray(x), k)
    u_np, s_np, vt_np = np.linalg.svd(x, full_matrices=False)
    np.testing.assert_allclose(np.asarray(res.s), s_np[:k], rtol=2e-3)
    # Compare singular vectors up to sign
    for j in range(k):
        uj = np.asarray(res.U)[:, j]
        sign = np.sign(np.dot(uj, u_np[:, j]))
        np.testing.assert_allclose(uj * sign, u_np[:, j], atol=5e-3)
        vj = np.asarray(res.V)[j]
        np.testing.assert_allclose(vj * sign, vt_np[j], atol=5e-3)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_exact_svd_gram_matches_numpy(rng, mesh, use_mesh):
    """The Gram-route exact path (T << S fast path): same oracle as the
    TSQR route — eigh subspace + Rayleigh-Ritz restores f32 accuracy."""
    from dmd_era5_tpu.ops.svd import exact_truncated_svd_gram

    x = lowrank_matrix(rng, 1024, 32, rank=12)
    k = 8
    if use_mesh:
        xs, _ = shard_rows(x, mesh)
        res = exact_truncated_svd_gram(xs, k, mesh=mesh)
    else:
        res = exact_truncated_svd_gram(jnp.asarray(x), k)
    u_np, s_np, vt_np = np.linalg.svd(x, full_matrices=False)
    np.testing.assert_allclose(np.asarray(res.s), s_np[:k], rtol=2e-3)
    for j in range(k):
        uj = np.asarray(res.U)[:, j]
        sign = np.sign(np.dot(uj, u_np[:, j]))
        np.testing.assert_allclose(uj * sign, u_np[:, j], atol=5e-3)
        vj = np.asarray(res.V)[j]
        np.testing.assert_allclose(vj * sign, vt_np[j], atol=5e-3)
    u = np.asarray(res.U)
    np.testing.assert_allclose(u.T @ u, np.eye(k), atol=1e-4)


def test_truncated_svd_standard_auto_routes_gram_when_tall():
    """auto exact_method: decisively tall-skinny -> gram, else TSQR."""
    from dmd_era5_tpu.ops import svd as svd_mod

    rng = np.random.default_rng(3)
    x_tall = lowrank_matrix(rng, 512, 16, rank=4)
    x_square = lowrank_matrix(rng, 64, 32, rank=4)
    calls = []
    orig_gram = svd_mod.exact_truncated_svd_gram
    orig_tsqr = svd_mod.exact_truncated_svd
    try:
        svd_mod.exact_truncated_svd_gram = lambda *a, **kw: (
            calls.append("gram"),
            orig_gram(*a, **kw),
        )[1]
        svd_mod.exact_truncated_svd = lambda *a, **kw: (
            calls.append("tsqr"),
            orig_tsqr(*a, **kw),
        )[1]
        svd_mod.truncated_svd(jnp.asarray(x_tall), 4, svd_type="standard")
        svd_mod.truncated_svd(jnp.asarray(x_square), 4, svd_type="standard")
    finally:
        svd_mod.exact_truncated_svd_gram = orig_gram
        svd_mod.exact_truncated_svd = orig_tsqr
    assert calls == ["gram", "tsqr"]


def test_exact_svd_reconstruction(rng, mesh):
    x = lowrank_matrix(rng, 2048, 24, rank=6, noise=0.0)
    xs, _ = shard_rows(x, mesh)
    res = exact_truncated_svd(xs, 6, mesh=mesh)
    recon = np.asarray(res.U) @ np.diag(np.asarray(res.s)) @ np.asarray(res.V)
    np.testing.assert_allclose(recon, x, atol=1e-3)


# ---------------------------------------------------------- randomized


@pytest.mark.parametrize("use_mesh", [False, True])
def test_randomized_svd_subspace(rng, mesh, use_mesh):
    x = lowrank_matrix(rng, 1024, 64, rank=10, noise=1e-4)
    k = 10
    if use_mesh:
        xs, _ = shard_rows(x, mesh)
        res = randomized_svd(xs, k, mesh=mesh, seed=0)
    else:
        res = randomized_svd(jnp.asarray(x), k, seed=0)
    u_np, s_np, vt_np = np.linalg.svd(x, full_matrices=False)
    np.testing.assert_allclose(np.asarray(res.s), s_np[:k], rtol=1e-2)
    assert subspace_angle_err(np.asarray(res.U), u_np[:, :k]) < 1e-3
    assert subspace_angle_err(np.asarray(res.V).T, vt_np[:k].T) < 1e-3


def test_randomized_svd_matches_sklearn_semantics(rng):
    """Same truncation + comparable reconstruction error as sklearn."""
    from sklearn.utils.extmath import randomized_svd as sk_rsvd

    x = lowrank_matrix(rng, 512, 48, rank=16, noise=1e-3)
    k = 8
    res = randomized_svd(jnp.asarray(x), k, seed=1)
    u_sk, s_sk, v_sk = sk_rsvd(x, n_components=k, random_state=0)
    assert np.asarray(res.U).shape == u_sk.shape
    assert np.asarray(res.s).shape == s_sk.shape
    assert np.asarray(res.V).shape == v_sk.shape
    ours = np.linalg.norm(
        x - np.asarray(res.U) @ np.diag(np.asarray(res.s)) @ np.asarray(res.V)
    )
    theirs = np.linalg.norm(x - u_sk @ np.diag(s_sk) @ v_sk)
    assert ours <= theirs * 1.05
    np.testing.assert_allclose(np.asarray(res.s), s_sk, rtol=1e-2)


def test_randomized_mesh_matches_single_device(rng, mesh):
    """Same seed => same sketch => allclose across mesh layouts."""
    x = lowrank_matrix(rng, 1024, 32, rank=8, noise=1e-4)
    res1 = randomized_svd(jnp.asarray(x), 6, seed=3)
    xs, _ = shard_rows(x, mesh)
    res8 = randomized_svd(xs, 6, mesh=mesh, seed=3)
    np.testing.assert_allclose(
        np.asarray(res8.s), np.asarray(res1.s), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res8.U), np.asarray(res1.U), atol=5e-3
    )


def test_randomized_bf16_gemm_path(rng, mesh):
    x = lowrank_matrix(rng, 1024, 32, rank=8, noise=1e-4)
    xs, _ = shard_rows(x, mesh)
    res = randomized_svd(xs, 6, mesh=mesh, seed=0, gemm_dtype=jnp.bfloat16)
    u_np, s_np, _ = np.linalg.svd(x, full_matrices=False)
    np.testing.assert_allclose(np.asarray(res.s), s_np[:6], rtol=2e-2)
    assert subspace_angle_err(np.asarray(res.U), u_np[:, :6]) < 5e-2


# ---------------------------------------------------------- dispatcher


def test_truncated_svd_dispatch(rng):
    x = lowrank_matrix(rng, 256, 16, rank=4)
    for svd_type in ("standard", "randomized"):
        res = truncated_svd(jnp.asarray(x), 4, svd_type=svd_type)
        assert res.U.shape == (256, 4)
        assert res.s.shape == (4,)
        assert res.V.shape == (4, 16)
    with pytest.raises(ValueError, match="not supported"):
        truncated_svd(jnp.asarray(x), 4, svd_type="magic")


def test_mock_era5_oracle_parity(mesh):
    """End-to-end slice: preprocessed mock snapshot matrix through the
    distributed exact SVD matches the host oracle (north-star config 1)."""
    from dmd_era5_tpu.snapmat import create_mock_era5_svd

    U, s, V, coords, X = create_mock_era5_svd(
        "2020-01-01",
        "2020-01-02",
        delay_embedding=2,
        n_components=10,
        seed=42,
    )
    x = np.asarray(X.data, dtype=np.float32)
    xs, _ = shard_rows(x, mesh)
    res = exact_truncated_svd(xs, 10, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res.s), s, rtol=1e-3)
    for j in range(10):
        uj = np.asarray(res.U)[:, j]
        sign = np.sign(np.dot(uj, U[:, j]))
        np.testing.assert_allclose(uj * sign, U[:, j], atol=2e-2)


def test_randomized_svd_2d_grid_sharded(rng):
    """Grid-sharded (space x time) randomized SVD == single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmd_era5_tpu.ops.svd import randomized_svd_2d

    mesh2d = make_mesh("space=4,time=2")
    x = lowrank_matrix(rng, 1024, 64, rank=10, noise=1e-4)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh2d, P("space", "time"))
    )
    res = randomized_svd_2d(xs, 8, mesh=mesh2d, seed=2)
    ref = randomized_svd(jnp.asarray(x), 8, seed=2)
    np.testing.assert_allclose(
        np.asarray(res.s), np.asarray(ref.s), rtol=1e-3
    )
    u_np = np.linalg.svd(x, full_matrices=False)[0]
    assert subspace_angle_err(np.asarray(res.U), u_np[:, :8]) < 1e-3
    assert res.U.sharding.spec == P("space", None)


def test_randomized_svd_2d_time_only(rng):
    """Pure sequence-parallel layout: all devices on the time axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmd_era5_tpu.ops.svd import randomized_svd_2d

    mesh2d = make_mesh("time=8")
    x = lowrank_matrix(rng, 512, 64, rank=6, noise=1e-4)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh2d, P("space", "time"))
    )
    res = randomized_svd_2d(xs, 6, mesh=mesh2d, seed=0)
    s_host = np.linalg.svd(x, compute_uv=False)[:6]
    np.testing.assert_allclose(np.asarray(res.s), s_host, rtol=1e-2)
