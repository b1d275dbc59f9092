"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax device query. The environment's sitecustomize
registers a TPU ('axon') backend at interpreter start, so JAX_PLATFORMS from
the environment is not enough — we override via jax.config, which works as
long as no devices have been initialized yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["CRT_DISABLE_FLASH"] = "1"  # pallas kernels need TPU; tests run on CPU

import jax

jax.config.update("jax_platforms", "cpu")

from clip_retrieval_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()  # CPU-mesh GSPMD compiles persist across runs

import numpy as np
import pytest


def pytest_collection_modifyitems(items):
    """Run the multi-device collective tests first: jax 0.9's CPU backend
    intermittently aborts (SIGABRT in buffer readback) when a donated
    shard_map/collective program executes after hundreds of other programs
    in the same process. Running them on a fresh runtime sidesteps the
    upstream bug; tracked for revisit on a jax upgrade."""
    items.sort(
        key=lambda it: 0 if "test_parallel" in str(it.fspath) else 1
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
