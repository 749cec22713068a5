"""Isolate the year-leg (T = 8760) Gram accumulation error on the chip.

The year record (`era5_year_T8760_exact_gram`, BASELINE.md round 5)
shows all-100 oracle s rel err 0.104 against the *unrounded* synthetic
spectrum.  This experiment pins where that error lives: it builds a
rank-128 synthetic at the year's time axis, stores it as bf16, and runs
the SAME per-block device Gram products through BOTH accumulation
routes of `pipeline/streamed_fit.py::streamed_exact_gram_svd`:

  A. device f32 accumulator, fetched once (the shipped wide-T path —
     at T = 8760 the partial Gram is 307 MB and 64 per-block d2h
     fetches would move ~20 GB through a 20-50 MB/s tunnel);
  B. per-block d2h + host f64 accumulation (the oracle-grade scheme
     used below the 8 MB cutoff).

Measured (v5e, 2026-08-21): spectra from A and B agree to 1.2e-8
(all-100); route B costs 1091 s of d2h against A's 34 s.  The year
record's 0.104 tail is therefore bf16 STORAGE quantization measured
against an unrounded oracle (tail at s99/s0 = 7.6e-5), shared by every
route reading the same bytes — not an accumulation artifact.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/dmd_era5_tpu_jax_cache"
    )
    from era5_scale_bench import _temporal_basis

    rng = np.random.default_rng(0)
    s_rows, t_cols, r_true = 1 << 16, 8760, 128
    sigma = 120.0 * (np.arange(1, r_true + 1, dtype=np.float64)) ** -0.7
    v_t = _temporal_basis(t_cols, rng)
    w = (sigma[:, None] * v_t.T).astype(np.float32)
    x32 = rng.standard_normal((s_rows, r_true)).astype(np.float32) @ w
    xb = x32.astype(ml_dtypes.bfloat16)

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    @jax.jit
    def block_gram(blk):
        bf = blk.astype(jnp.float32)
        return jnp.matmul(
            bf.T, bf, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    blk_rows = 1 << 10  # 64 blocks, matching the year run
    blocks = [xb[i : i + blk_rows] for i in range(0, s_rows, blk_rows)]

    t0 = time.time()
    acc = jax.device_put(jnp.zeros((t_cols, t_cols), jnp.float32), dev)
    for b in blocks:
        acc = acc + block_gram(jax.device_put(jnp.asarray(b), dev))
    g_dev = np.asarray(acc, np.float64)
    print(f"A: device f32 accumulator  {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    g_host = np.zeros((t_cols, t_cols), np.float64)
    for b in blocks:
        g_host += np.asarray(
            block_gram(jax.device_put(jnp.asarray(b), dev)), np.float64
        )
    print(f"B: host f64 accumulation   {time.time() - t0:.1f}s", flush=True)

    print(
        "gram diff: max =", np.abs(g_dev - g_host).max(),
        " rel fro =",
        np.linalg.norm(g_dev - g_host) / np.linalg.norm(g_host),
        flush=True,
    )
    s_dev = np.sqrt(np.maximum(np.linalg.eigvalsh(g_dev)[::-1][:100], 0))
    s_host = np.sqrt(np.maximum(np.linalg.eigvalsh(g_host)[::-1][:100], 0))
    rel = np.abs(s_dev - s_host) / np.maximum(s_host, 1e-30)
    print(
        f"device-vs-host spectra: head8={rel[:8].max():.3e} "
        f"all100={rel.max():.3e}"
    )


if __name__ == "__main__":
    main()
