"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` so the very same pjit/shard_map
programs that target a TPU pod slice compile and execute here.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env points at the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU backend and force-sets
# jax_platforms; override it back so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# --- XLA:CPU long-suite stability -----------------------------------------
# Full single-process runs of the whole suite intermittently segfault inside
# ``backend_compile_and_load`` after ~180 tests / thousands of CPU compiles
# (jax/jaxlib 0.9.0; observed at different tests each run, always mid-
# compile — an accumulation effect in the CPU client, not a specific test).
# Dropping every compiled executable between modules keeps the live-
# executable population small; module boundaries amortize the recompiles
# (shared fixtures are module-scoped anyway).
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
