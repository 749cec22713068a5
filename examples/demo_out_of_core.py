"""Out-of-core decomposition demo: factor a matrix without holding it.

The capability the reference cannot offer at any size (its pipeline
materializes the full matrix in host RAM before `np.linalg.svd`,
/root/reference/src/dmd_era5/era5_svd/era5_svd.py:251): write a packed
snapshot artifact to disk, then run

- the EXACT 2-pass Gram route (f64-accumulated T x T Gram + host
  eigh + one lift pass — deterministic, the fewest-pass schedule),
- the streamed randomized SVD (n_iter + 2 disk passes, device holds
  one row block at a time, U returns on host), and
- the one-pass two-sided sketch (a SINGLE disk pass — fit while the
  data streams in),

and compare all three against numpy dense.  At production scale the
same entry points handle the 0.25-degree ERA5 week/month and the
T=8760 hourly year (BASELINE.md "Round-5"); `svd_backend = auto` in
config.ini routes there automatically when the matrix exceeds the
per-device HBM budget.

Run from the repo root:  python examples/demo_out_of_core.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from dmd_era5_tpu.pipeline.streamed_fit import (  # noqa: E402
    streamed_exact_gram_svd,
    streamed_onepass_svd,
    streamed_randomized_svd,
)
from dmd_era5_tpu.snapmat.loader import save_packed_matrix  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(0)
    s_rows, t_cols, k = 1 << 15, 128, 12

    # a matrix with known decaying structure + noise
    u_true, _ = np.linalg.qr(rng.standard_normal((s_rows, 16)))
    v_true, _ = np.linalg.qr(rng.standard_normal((t_cols, 16)))
    sig = np.geomspace(100.0, 5.0, 16)
    x = ((u_true * sig) @ v_true.T).astype(np.float32)
    x += 0.01 * rng.standard_normal(x.shape).astype(np.float32)

    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "snapshots.h5"
        # bf16 packing halves the disk/stream footprint — the loader
        # contract every streamed backend decodes natively
        save_packed_matrix(path, x, d=1, bf16=True)
        print(f"packed artifact: {path.stat().st_size / 1e6:.1f} MB")

        t0 = time.perf_counter()
        res = streamed_randomized_svd(path, k, block_rows=4096)
        t_streamed = time.perf_counter() - t0

        t0 = time.perf_counter()
        res1 = streamed_onepass_svd(path, k, block_rows=4096)
        t_onepass = time.perf_counter() - t0

        t0 = time.perf_counter()
        res_x = streamed_exact_gram_svd(path, k, block_rows=4096)
        t_exact = time.perf_counter() - t0

    s_ref = np.linalg.svd(x, compute_uv=False)[:k]
    err_s = np.max(np.abs(np.asarray(res.s) - s_ref) / s_ref)
    err_1 = np.max(np.abs(np.asarray(res1.s)[:8] - s_ref[:8]) / s_ref[:8])
    print(
        f"streamed  ({t_streamed:5.1f}s): U {res.U.shape} on host, "
        f"max s rel err {err_s:.2e}"
    )
    print(
        f"one-pass  ({t_onepass:5.1f}s): single disk read, "
        f"head-8 s rel err {err_1:.2e}"
    )
    err_x = np.max(np.abs(np.asarray(res_x.s) - s_ref) / s_ref)
    print(
        f"exact gram({t_exact:5.1f}s): 2 disk passes, "
        f"max s rel err {err_x:.2e} (bf16-storage-bounded)"
    )
    # one-pass trades a constant-factor accuracy hit for the saved pass;
    # the exact route is bounded only by the bf16 storage rounding
    assert err_s < 5e-2 and err_1 < 2e-1 and err_x < 2e-2
    print("out-of-core factors agree with dense numpy.")


if __name__ == "__main__":
    main()
