"""Configuration system."""
from mile_tpu.config.base import BaseConfig, CfgEnum, ConfigError  # noqa: F401
from mile_tpu.config.core import Config  # noqa: F401
from mile_tpu.config.data import DataConfig, DatasetType, Source, Task  # noqa: F401
from mile_tpu.config.models import (  # noqa: F401
    Activation,
    AttentionClassifierConfig,
    EmbeddingClassifierConfig,
    FCNConfig,
    FloatPrecision,
    GPTConfig,
    LeNetConfig,
    LeNettiConfig,
    ModelConfig,
    PartitionFCNConfig,
    PretrainedAttentionClassifierConfig,
)
from mile_tpu.config.training import (  # noqa: F401
    Optimizer,
    OptimizerConfig,
    PriorConfig,
    PriorDist,
    Sampler,
    SamplerConfig,
    TokenizerConfig,
    TokenizerName,
    TrainingConfig,
    WarmstartConfig,
)
