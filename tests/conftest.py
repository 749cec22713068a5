"""Test harness configuration.

Must run before anything imports jax or dmd_era5_tpu:
- forces the CPU backend with 8 virtual devices so the multi-chip
  sharding paths are exercised on a simulated mesh (the TPU-build
  analogue of the reference's mock-data tier, SURVEY.md section 4);
- redirects the project root to a session tmp dir so logs/ and data/
  artifacts never pollute the repo.
"""

from __future__ import annotations

import os
import tempfile

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

_SESSION_ROOT = tempfile.mkdtemp(prefix="dmd_era5_tpu_test_")
os.environ["DMD_ERA5_TPU_ROOT"] = _SESSION_ROOT

# The axon TPU plugin (if present) forces jax_platforms="axon,cpu" during
# registration, overriding the env var — force it back to the virtual
# CPU mesh before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (VERDICT r4 item 10): the 380+-test
# suite is compile-latency dominated — identical programs recompile per
# xdist worker and per run.  A shared on-disk cache lets every worker
# (and every warm rerun) reuse compiled executables.  Low thresholds:
# the suite's programs are many and individually cheap to compile, so
# caching only >1 s compiles (the default) would miss most of the win.
_CACHE_DIR = os.environ.get(
    "JAX_TEST_CACHE_DIR", "/tmp/dmd_era5_tpu_jax_cache_tests"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def session_root() -> str:
    return _SESSION_ROOT


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


# ---- shared config dicts (mirroring the reference conftest fixture style,
# /root/reference/tests/conftest.py) -----------------------------------------

BASE_DOWNLOAD_CONFIG = {
    "source_path": "gs://gcp-public-data-arco-era5/ar/"
    "1959-2022-full_37-1h-0p25deg-chunk-1.zarr-v2",
    "start_datetime": "2019-01-01T00",
    "end_datetime": "2019-01-02T00",
    "delta_time": "1h",
    "variables": "temperature",
    "levels": "1000",
}

BASE_SVD_CONFIG = {
    **BASE_DOWNLOAD_CONFIG,
    "svd_type": "standard",
    "delay_embedding": 2,
    "mean_center": True,
    "scale": False,
    "n_components": 10,
    "save_data_matrix": True,
}


@pytest.fixture()
def download_config() -> dict:
    return dict(BASE_DOWNLOAD_CONFIG)


@pytest.fixture()
def svd_config() -> dict:
    return dict(BASE_SVD_CONFIG)
