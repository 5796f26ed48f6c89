"""Test environment: force the CPU backend with 8 virtual devices so the
full suite (including multi-chip sharding tests) runs hardware-free.
Must run before any jax import."""

import os

# Hard override: this machine's sitecustomize registers the axon TPU
# tunnel and forces JAX_PLATFORMS=axon; unit tests must run
# hardware-free on an 8-device virtual CPU mesh, so re-force cpu via
# jax.config (which wins over the plugin's env override) before any
# backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpuaudiobench_tpu.config import BenchConfig  # noqa: E402


@pytest.fixture
def small_cfg():
    """Scaled-down config for fast end-to-end tests."""
    return BenchConfig(
        buffer_size=64,
        n_tracks=8,
        n_runs=3,
        warmup=1,
        rndmem_pool_mb=8,
        write_latencies=False,
        device_timing=False,
        sol_fma_k=16,
        sol_fma_mib=1,
        sol_stream_mib=1,
        sol_matmul_dim=128,
    )


@pytest.fixture
def rng():
    return np.random.Generator(np.random.MT19937(123))
