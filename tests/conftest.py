"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the "multi-node without a cluster" mechanism (SURVEY.md §4): XLA's
host platform is split into 8 virtual devices so sharding/collective code
paths are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force even when an axon TPU is tunneled
# Disarm remote-PJRT registration in every CHILD interpreter the suite
# spawns (subprocess CLI tests, 2-process distributed test, pool workers):
# the sitecustomize it triggers retry-sleeps forever when the tunnel is
# down, wedging children at startup. In-process we already force cpu via
# jax.config below; children need the env-level disarm.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    # 8 virtual devices; on low-core CI boxes the per-device programs run
    # nearly serially, so give the in-process collectives generous
    # rendezvous timeouts (default 20s warn / 40s abort)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200").strip()

import jax  # noqa: E402

# the axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, locking the env-derived config before this file runs;
# override at the config level so tests always use the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the deep-model compiles dominate test wall-time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny_cfg():
    from stylesinger_tpu.config import tiny_test_config
    return tiny_test_config()
