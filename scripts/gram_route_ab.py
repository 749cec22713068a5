"""A/B the exact-SVD Gram route: pass-1 precision vs accuracy + breakdown.

Same-process interleaved timing (the only trustworthy micro-benchmark
methodology through the tunnel — see BASELINE.md).  Components:

  - pass-1 Pallas Gram at HIGHEST (6-pass) vs HIGH (3-pass)
  - eigh of the T x T Gram (S-independent; slope over inner repeats)
  - the fused Rayleigh-Ritz pass (sketch_center_gram_project)
  - end-to-end exact_truncated_svd_gram at both pass-1 precisions

Accuracy is judged against a float64 numpy SVD oracle on the same X.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def _min_time(fn, *args, reps: int = 8) -> float:
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/dmd_era5_tpu_jax_cache"
    )

    from dmd_era5_tpu.ops.qr_panel import gram
    from dmd_era5_tpu.ops.svd import exact_truncated_svd_gram

    dev = jax.devices()[0]
    print("device:", dev.platform, getattr(dev, "device_kind", "?"))

    s_rows, t_cols, k = 1 << 19, 512, 100
    key = jax.random.key(0)

    def make_x(rows):
        # decaying spectrum like standardized ERA5 (not iid noise):
        # X = A diag(sigma) B^T with sigma_j = j^-0.7
        ka, kb = jax.random.split(jax.random.fold_in(key, rows))
        a = jax.random.normal(ka, (rows, t_cols), dtype=jnp.float32)
        b = jax.random.normal(kb, (t_cols, t_cols), dtype=jnp.float32)
        sig = jnp.arange(1, t_cols + 1, dtype=jnp.float32) ** -0.7
        return jax.device_put(a * sig[None, :] @ b.T, dev)

    x1, x3 = make_x(s_rows), make_x(3 * s_rows)

    def _prec(name):
        return name if name == "bf16_split" else getattr(
            jax.lax.Precision, name
        )

    # ---- pass-1 Gram precision slope timing
    for prec in ("HIGHEST", "bf16_split", "DEFAULT"):
        p = _prec(prec)
        fn = jax.jit(functools.partial(gram, precision=p))
        ts = _min_time(fn, x1)
        tl = _min_time(fn, x3)
        print(
            f"gram[{prec:10s}]: S {ts*1e3:7.1f} ms  3S {tl*1e3:7.1f} ms  "
            f"slope {(tl-ts)/2*1e3:6.2f} ms"
        )

    # ---- eigh cost (S-independent): slope over inner repeats
    g = jax.jit(gram)(x1)

    def eigh_n(n):
        def body(i, gg):
            _, v = jnp.linalg.eigh(gg)
            return gg + 0.0 * v[0, 0]

        return jax.jit(lambda gg: jax.lax.fori_loop(0, n, body, gg))

    t1 = _min_time(eigh_n(1), g)
    t5 = _min_time(eigh_n(5), g)
    print(f"eigh({t_cols}): {(t5-t1)/4*1e3:.2f} ms per call")

    # ---- end-to-end at both precisions
    for prec in ("HIGHEST", "bf16_split"):
        p = _prec(prec)
        fn = jax.jit(
            lambda x, p=p: exact_truncated_svd_gram(x, k, gram_precision=p).s
        )
        ts = _min_time(fn, x1)
        tl = _min_time(fn, x3)
        dt = (tl - ts) / 2
        print(
            f"exact_gram[{prec:10s}]: slope {dt*1e3:6.2f} ms  "
            f"{s_rows*t_cols/dt/1e9:6.1f} Gelem/s"
        )

    # ---- accuracy vs float64 oracle (smaller S so the host SVD fits)
    s_acc = 1 << 16
    xa = make_x(s_acc)
    xh = np.asarray(xa, dtype=np.float64)
    u0, s0, vt0 = np.linalg.svd(xh, full_matrices=False)
    for prec in ("HIGHEST", "bf16_split", "DEFAULT"):
        p = _prec(prec)
        res = jax.jit(
            lambda x, p=p: exact_truncated_svd_gram(x, k, gram_precision=p)
        )(xa)
        s_err = np.max(
            np.abs(np.asarray(res.s) - s0[:k]) / s0[:k]
        )
        # principal-angle error of the top-k left subspace
        ov = u0[:, :k].T @ np.asarray(res.U, dtype=np.float64)
        ang = np.sqrt(max(0.0, 1.0 - np.min(np.linalg.svd(ov)[1]) ** 2))
        # orthonormality of returned U
        orth = np.max(
            np.abs(
                np.asarray(res.U, np.float64).T @ np.asarray(res.U, np.float64)
                - np.eye(k)
            )
        )
        print(
            f"acc[{prec:10s}]: s rel err {s_err:.2e}  subspace angle "
            f"{ang:.2e}  |U^T U - I| {orth:.2e}"
        )


if __name__ == "__main__":
    main()
