"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices. Set CAPSAICIN_TEST_TPU=1 to run the
suite on real devices instead.
"""

import os

if not os.environ.get("CAPSAICIN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Some environments pre-register an accelerator PJRT plugin via
    # sitecustomize and ignore the env var; force the config too.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
