"""Out-of-core decomposition: stream a packed snapshot file through the
randomized SVD without ever holding X in device memory.

The pipeline-parallel ingest mandated by SURVEY.md section 2b ("PP:
stage pipeline ... with double-buffered snapshot blocks"): row blocks of
the packed artifact stream disk -> host -> device on a prefetch thread
while the device runs the current block's GEMM.  Device residency is
O(S * r) for the factors plus two in-flight blocks — matrices larger
than HBM decompose fine.

Pass schedule (n_iter + 2 disk passes total):
  passes 1..n_iter:  Z <- X^T (X Z) fused per block visit (Z_0 = Omega;
                     Z re-orthonormalized between passes, T x r QR)
  pass n_iter + 1:   Y_blk = X_blk @ Z      -> Q = orth(Y) on device
  pass n_iter + 2:   B += Q_blk^T X_blk     (projection, accumulated small)
  final:             small SVD of B, U = Q @ U_b.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from dmd_era5_tpu.core.logging import log_and_print, setup_logger
from dmd_era5_tpu.ops.svd import SVDResult, _svd_flip_v_based, sklearn_n_iter
from dmd_era5_tpu.ops.tsqr import _local_factor, default_qr_method
from dmd_era5_tpu.snapmat.loader import packed_info, read_packed_rows

logger = setup_logger("StreamedFit", "streamed_fit.log")

__all__ = [
    "streamed_randomized_svd",
    "streamed_onepass_svd",
    "prefetched_row_blocks",
]


def prefetched_row_blocks(
    path: str | Path,
    n_rows: int,
    block_rows: int,
    depth: int = 2,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (row_start, block) with a background prefetch thread.

    The reader thread stays ``depth`` blocks ahead of the consumer, so
    disk IO overlaps host->device transfer and device compute
    (double-buffering with depth=2).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()

    def reader():
        try:
            for r0 in range(0, n_rows, block_rows):
                r1 = min(r0 + block_rows, n_rows)
                q.put((r0, read_packed_rows(path, r0, r1)))
        finally:
            q.put(stop)

    thread = threading.Thread(target=reader, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
    thread.join()


def streamed_randomized_svd(
    path: str | Path,
    n_components: int,
    block_rows: int = 1 << 16,
    n_oversamples: int = 10,
    n_iter: int | str = "auto",
    seed: int = 0,
    device=None,
    qr_method: str | None = None,
    block_dtype=None,
) -> SVDResult:
    """Randomized truncated SVD of a packed snapshot artifact, streamed.

    Power iterations are FUSED: one streamed pass computes
    Y_blk = X_blk @ Z and accumulates Z_next += X_blk^T Y_blk in the
    same block visit — i.e. Z_next = (X^T X) Z from a single disk read,
    with Z re-orthonormalized between passes (a T x r Householder QR,
    free next to the stream).  Total disk passes: **n_iter + 2** —
    pass 1 seeds Z from the Gaussian sketch, passes 2..n_iter iterate,
    pass n_iter+1 materializes Y = X Z for the range basis, and pass
    n_iter+2 projects B = Q^T X.  (The unfused schedule re-read the
    file twice per iteration: 2 n_iter + 2 passes.)

    ``block_dtype``: on-device dtype of the streamed blocks.  Default
    keeps the file's dtype — a bf16-packed artifact (the packer's
    native output) streams bf16, halving host->device and HBM traffic;
    every GEMM accumulates fp32 regardless.
    """
    (n_rows, t_cols), _, _bf16 = packed_info(path)
    n_random = n_components + n_oversamples
    if isinstance(n_iter, str):
        n_iter = sklearn_n_iter(n_components, (n_rows, t_cols))
    qr_method = qr_method or default_qr_method()
    device = device or jax.devices()[0]

    key = jax.random.key(seed)
    omega = jax.device_put(
        jax.random.normal(key, (t_cols, n_random), dtype=jnp.float32), device
    )

    def to_dev(blk: np.ndarray) -> jax.Array:
        if blk.dtype == np.uint16:  # bf16-packed storage (loader contract)
            blk = blk.view(np.dtype(jnp.bfloat16))
        arr = jnp.asarray(blk)
        if block_dtype is not None:
            arr = arr.astype(block_dtype)
        return jax.device_put(arr, device)

    def sketch_blk(blk, om):
        # the per-block sketch GEMM runs on the Pallas tiled kernel
        # (ops.matmul.matmul, fp32 VMEM accumulation) when the block
        # tiles cleanly; ragged tail blocks fall back to XLA's dot
        from dmd_era5_tpu.ops.matmul import matmul as pallas_matmul

        m, k = blk.shape
        n = om.shape[1]
        tiles_ok = (
            m % min(512, m) == 0
            and k % min(512, k) == 0
            and n % min(128, n) == 0
        )
        if tiles_ok:
            return pallas_matmul(blk, om.astype(blk.dtype))
        return jnp.matmul(
            blk, om.astype(blk.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    project_blk = jax.jit(
        lambda q_blk, blk, acc: acc
        + jnp.matmul(
            q_blk.T.astype(jnp.float32), blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    gram_apply_blk = jax.jit(
        lambda blk, y_blk, acc: acc
        + jnp.matmul(
            blk.T.astype(jnp.float32), y_blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )

    def stream_sketch(target: jax.Array) -> jax.Array:
        """One pass: Y = X @ target, blocks prefetched."""
        y_parts = []
        for r0, blk in prefetched_row_blocks(path, n_rows, block_rows):
            y_parts.append(sketch_blk(to_dev(blk), target))
        return jnp.concatenate(y_parts, axis=0)

    def stream_gram_apply(target: jax.Array) -> jax.Array:
        """One FUSED pass: Z_next = X^T (X @ target) — the sketch and
        its transposed re-projection share each block visit, so a power
        iteration costs one disk read instead of two."""
        acc = jax.device_put(
            jnp.zeros((t_cols, target.shape[1]), jnp.float32), device
        )
        for r0, blk in prefetched_row_blocks(path, n_rows, block_rows):
            dev_blk = to_dev(blk)
            y_blk = sketch_blk(dev_blk, target)
            acc = gram_apply_blk(dev_blk, y_blk, acc)
        return acc

    def stream_project(q: jax.Array) -> jax.Array:
        """One pass: B = Q^T X accumulated block by block."""
        acc = jax.device_put(
            jnp.zeros((q.shape[1], t_cols), jnp.float32), device
        )
        for r0, blk in prefetched_row_blocks(path, n_rows, block_rows):
            dev_blk = to_dev(blk)
            q_blk = jax.lax.dynamic_slice_in_dim(
                q, r0, dev_blk.shape[0], axis=0
            )
            acc = project_blk(q_blk, dev_blk, acc)
        return acc

    log_and_print(
        logger,
        f"Streaming SVD: {n_rows} x {t_cols} in {block_rows}-row blocks "
        f"({(n_rows + block_rows - 1) // block_rows} blocks/pass, "
        f"{n_iter + 2} passes)",
    )
    if n_iter > 0:
        z = stream_gram_apply(omega)  # pass 1: Z = (X^T X) Omega
        for _ in range(n_iter - 1):  # passes 2..n_iter
            z, _ = _local_factor(z, "householder")
            z = stream_gram_apply(z)
        z, _ = _local_factor(z, "householder")
        y = stream_sketch(z)  # pass n_iter + 1: the range basis
    else:
        y = stream_sketch(omega)
    q, _ = _local_factor(y, qr_method)

    b = stream_project(q)  # final pass
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.matmul(q, u_b, precision=jax.lax.Precision.HIGHEST)
    u, vt = _svd_flip_v_based(u, vt)
    return SVDResult(
        u[:, :n_components], s[:n_components], vt[:n_components, :]
    )


def streamed_onepass_svd(
    path: str | Path,
    n_components: int,
    block_rows: int = 1 << 16,
    n_oversamples: int | None = None,
    l_sketch: int | None = None,
    seed: int = 0,
    center: bool = False,
    device=None,
) -> SVDResult:
    """Randomized truncated SVD of a packed artifact in ONE disk pass.

    The two-sided-sketch route (ops.onepass): the co-range sketch
    W = Psi X accumulates alongside the range sketch per row block, so
    the projection step never re-reads the file.  Use this when the
    matrix is too large (or too remote) to stream twice; accuracy
    trades a constant-factor residual inflation for the saved pass —
    ``streamed_randomized_svd`` remains the high-accuracy option.
    """
    from dmd_era5_tpu.ops.onepass import OnePassSketch

    (n_rows, t_cols), _, _ = packed_info(path)
    sk = OnePassSketch(
        t_cols,
        n_components,
        n_oversamples=n_oversamples,
        l_sketch=l_sketch,
        seed=seed,
        center=center,
        device=device,
    )
    log_and_print(
        logger,
        f"One-pass streaming SVD: {n_rows} x {t_cols} in "
        f"{block_rows}-row blocks (single disk pass)",
    )
    for r0, blk in prefetched_row_blocks(path, n_rows, block_rows):
        sk.update(r0, jnp.asarray(blk, jnp.float32))
    return sk.finalize()
