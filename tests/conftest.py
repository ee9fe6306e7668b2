"""Test configuration: force an 8-device virtual CPU mesh + float64.

The real TPU chip is reserved for benchmarks; unit tests (including the
multi-device sharding tests) run on the CPU backend with
``--xla_force_host_platform_device_count=8`` so ``Mesh(('block','intra'))``
paths execute without TPU hardware — the analog of the reference running
its 4-rank MPI test binary on one laptop (``makefile:185-188``).
"""

import os
import sys

# Must happen before any jax backend is initialized.  NOTE: the image's
# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon in
# the env, so env vars set here are too late for the platform choice — use
# jax.config.update instead.  XLA_FLAGS is still read lazily at CPU-client
# init, so setting it here works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process spawns)"
    )


@pytest.fixture(scope="session")
def mesh8():
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("block", "intra"))
