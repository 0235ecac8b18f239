"""Test configuration.

The suite runs on a single-device CPU backend by default (deterministic,
fast compiles). Multi-chip sharding is validated by tests/test_multichip.py,
which spawns subprocesses with an 8-virtual-device CPU mesh
(--xla_force_host_platform_device_count) — scoping the SPMD tax to the two
tests that need it instead of every compile in the suite.

Set CAPSAICIN_TEST_TPU=1 to run the suite on real devices instead.
"""

import os

if not os.environ.get("CAPSAICIN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Some environments pre-register an accelerator PJRT plugin via
    # sitecustomize and ignore the env var; force the config too.
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache for the CPU test runs: full-pipeline CPU
    # compiles cost ~80s each; warm runs of the suite reuse them. Safe here
    # because the cache stays on one host (cross-host CPU AOT reuse is what
    # can SIGILL — see render/session.py, which therefore only enables the
    # cache on TPU).
    _cache = os.path.expanduser("~/.cache/capsaicin_tpu/xla-cpu-tests")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
