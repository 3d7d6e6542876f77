"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the survey's multi-device test strategy (SURVEY.md §4): sharded
search logic is validated without TPU hardware by forcing the CPU backend
with 8 logical host devices.  Must run before the first `import jax`.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU) via sitecustomize before any
# user code runs, so the env var route doesn't work — override the config
# directly before the backend initializes.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles on the
# single-core CPU runner; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    # XLA:CPU AOT cache entries embed machine-feature flags that trip noisy
    # loader warnings on this host; cache only the HLO level.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except AttributeError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: a session-scoped generator's stream depends on
    # which tests ran before, making data-dependent failures
    # irreproducible under -k / reordering
    return np.random.default_rng(42)


@pytest.fixture()
def tmp_db_path(tmp_path):
    return tmp_path / "db"


