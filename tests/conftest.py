"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This is the TPU analog of multi-node testing without a cluster (SURVEY.md §4): all
sharding tests run on `--xla_force_host_platform_device_count=8` fake devices.

Note: this environment's axon TPU plugin force-registers itself via sitecustomize and
sets ``jax_platforms=axon,cpu`` — plain ``JAX_PLATFORMS=cpu`` env vars are ignored, so
we override the config *after* importing jax, before any backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8
