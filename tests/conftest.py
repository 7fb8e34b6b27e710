"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the "multi-node without a cluster" mechanism (SURVEY.md §4): XLA's
host platform is split into 8 virtual devices so sharding/collective code
paths are exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny_cfg():
    from stylesinger_tpu.config import tiny_test_config
    return tiny_test_config()
