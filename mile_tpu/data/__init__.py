"""Data layer: loaders for tabular / image / text datasets."""
from mile_tpu.data.base import BaseLoader, resolve_data_path  # noqa: F401
from mile_tpu.data.tabular import TabularLoader  # noqa: F401


def build_loader(config, rng, target_len: int | None = None, tokenizer_config=None):
    """Construct the right loader for a DataConfig.

    Reference dispatch: /root/reference/src/training/trainer.py:86-111.
    """
    from mile_tpu.config.data import DatasetType

    if config.data_type == DatasetType.TABULAR:
        return TabularLoader(config, rng, target_len=target_len or config.target_len)
    if config.data_type == DatasetType.IMAGE:
        from mile_tpu.data.image import ImageLoader

        return ImageLoader(config, rng)
    if config.data_type == DatasetType.TEXT:
        from mile_tpu.data.text import TextLoader

        return TextLoader(config, rng, tokenizer_config=tokenizer_config)
    raise NotImplementedError(f'no loader for {config.data_type}')
