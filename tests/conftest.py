"""Test harness configuration.

Mirrors the reference harness strategy (`/root/reference/test/runtests.jl:1-27`):
the reference runs its whole suite once single-threaded and once
multi-threaded; our analog is running on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count=8``) so every sharded code path is
exercised without TPU hardware, plus Pallas kernels in interpret mode.
"""

import os

# Must run before jax is imported anywhere. Force CPU: the session may have
# JAX_PLATFORMS pointing at tunneled TPU hardware, which is slow and
# single-chip; tests want the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a tunneled TPU backend and forces
# jax_platforms='axon,cpu' via jax.config — override it back to CPU here
# (before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1234)  # same seed discipline as /root/reference/test/runtests.jl:7
    yield
