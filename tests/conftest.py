"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without a TPU pod (SURVEY.md §4), and enable x64 so
parity tests can run the device path in float64 against the NumPy oracle.

Note: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel); the env
var is not enough to override it, so we use jax.config directly."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The CPU backend keeps every compiled program's LLVM-JIT code alive
    for the process lifetime; at this suite's size (~200 tests, many
    compiling 8-device shard_map while-loops) the accumulation
    reproducibly segfaults XLA's compiler near the end of a full run
    (observed at ~4.8 GB RSS / ~180 tests in round 4 — the same tests
    pass in any sub-suite). Clearing between modules caps the live
    executable count; within-module sharing (the expensive compiles)
    is preserved.
    """
    yield
    import jax

    jax.clear_caches()
