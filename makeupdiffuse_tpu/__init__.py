"""makeupdiffuse_tpu — TPU-native MakeupDiffuse framework (JAX/XLA/Pallas).

Top-level convenience exports; see README.md for the full component map.
"""

from .config import Config, ModelConfig, SampleConfig, TrainConfig, load_config, save_config

__all__ = [
    "Config", "ModelConfig", "SampleConfig", "TrainConfig",
    "load_config", "save_config",
]
__version__ = "0.1.0"
