"""makeupdiffuse_tpu — TPU-native MakeupDiffuse framework (JAX/XLA/Pallas).

Top-level convenience exports; see README.md for the full component map.
"""

from .config import Config, ModelConfig, SampleConfig, TrainConfig, load_config, save_config

__all__ = [
    "Config", "ModelConfig", "SampleConfig", "TrainConfig",
    "load_config", "save_config",
    # lazy (import-heavy) surfaces — see __getattr__
    "api", "serving",
]
__version__ = "0.1.0"


def __getattr__(name):
    """Lazy submodule access (`makeupdiffuse_tpu.api`, `.serving`) without paying
    the jax/flax import cost for config-only callers."""
    if name in ("api", "serving"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
