"""Test config: force the CPU backend with 8 virtual devices.

Tests must be runnable without TPU hardware (the dev box has one chip, CI
may have none), so everything runs on the XLA CPU backend; sharding tests get
an 8-device virtual mesh (SURVEY.md §4's multi-host-on-CPU strategy) and
Pallas kernels run in interpreter mode (selected automatically by the
executor when the platform is not TPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: dev env pins the axon TPU

# pytest plugins (jaxtyping) import jax before this conftest, so the env var
# alone can be too late — jax.config still works until the backend initializes
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
