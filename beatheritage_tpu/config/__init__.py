"""Dataclass + YAML config system with the reference's CLI override grammar."""

from .loader import (
    DEFAULT_CONFIG_DIR,
    apply_overrides,
    compose_yaml,
    load_config,
    structure,
)
from .schema import (
    CheckpointConfig,
    DataConfig,
    DiffusionDataConfig,
    DiffusionModelConfig,
    DiffusionTrainConfig,
    FidConfig,
    InferenceConfig,
    MaiModConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    SpectrogramConfig,
    TrainConfig,
    TransformerConfig,
    as_dict,
)

__all__ = [
    "DEFAULT_CONFIG_DIR", "apply_overrides", "compose_yaml", "load_config",
    "structure", "CheckpointConfig", "DataConfig", "DiffusionDataConfig",
    "DiffusionModelConfig", "DiffusionTrainConfig", "FidConfig",
    "InferenceConfig", "MaiModConfig", "MeshConfig", "ModelConfig",
    "OptimizerConfig", "SpectrogramConfig", "TrainConfig",
    "TransformerConfig", "as_dict",
]
