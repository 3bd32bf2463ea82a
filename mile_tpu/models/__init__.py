"""Model zoo + registry (reference: /root/reference/src/models/__init__.py)."""
from __future__ import annotations

from flax import linen as nn

from mile_tpu.config.models import ModelConfig
from mile_tpu.models.attention import (  # noqa: F401
    AttentionClassifier,
    EmbeddingClassifier,
    PretrainedAttentionClassifier,
)
from mile_tpu.models.cnn import LeNet, LeNetti  # noqa: F401
from mile_tpu.models.fcn import FCN, PartitionFCN  # noqa: F401

MODEL_REGISTRY: dict[str, type[nn.Module]] = {
    'FCN': FCN,
    'PartitionFCN': PartitionFCN,
    'LeNet': LeNet,
    'LeNetti': LeNetti,
    'AttentionClassifier': AttentionClassifier,
    'PretrainedAttentionClassifier': PretrainedAttentionClassifier,
    'EmbeddingClassifier': EmbeddingClassifier,
}


def build_model(config: ModelConfig, data_config=None) -> nn.Module:
    """Instantiate the Flax module named by ``config.model``."""
    try:
        cls = MODEL_REGISTRY[config.model]
    except KeyError:
        raise KeyError(
            f'unknown model {config.model!r}; options: {sorted(MODEL_REGISTRY)}'
        ) from None
    return cls(config=config)
