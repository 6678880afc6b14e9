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

# persistent compilation cache: the suite is compile-dominated (tiny models, many
# grad graphs) — cached XLA artifacts cut repeat runs from ~30 min to minutes
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
# persist EVERY entry (threshold 0): remaining eager paths dispatch many distinct
# small executables (~60 ms compile each on this 1-core host); persisting them
# turns each into a disk load on the next run
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_session():
    """Session-shared tiny (Config, model, params) — the full-model init is the
    single most expensive fixture; share it across modules (treat params as
    read-only; copy before donating)."""
    from makeupdiffuse_tpu.config import tiny_test_config
    from makeupdiffuse_tpu.models.controlled_ldm import init_model

    cfg = tiny_test_config()
    model, params = init_model(cfg.model, jax.random.PRNGKey(0))
    return cfg, model, params
