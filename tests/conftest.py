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
