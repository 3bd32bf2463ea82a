"""Top-level experiment configuration.

Reference: /root/reference/src/config/core.py:25-306. Reference experiment
YAMLs load unchanged (same field names and nesting).
"""
from __future__ import annotations

import dataclasses
import logging
import time
import typing
from pathlib import Path
from typing import Any, Mapping

from mile_tpu.config.base import BaseConfig, ConfigError
from mile_tpu.config.data import DataConfig
from mile_tpu.config.models import ModelConfig
from mile_tpu.config.training import TrainingConfig

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class Config(BaseConfig):
    """Root config: data + model + training + bookkeeping."""

    saving_dir: str
    experiment_name: str
    data: DataConfig
    model: ModelConfig
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    rng: int = 42
    logging: bool = True
    # capture an XLA/TPU profiler trace of the compute phases into
    # <experiment_dir>/profile (TensorBoard-loadable). The reference has
    # no profiler integration (SURVEY §5.1).
    profile: bool = False

    # ``model:`` needs polymorphic resolution by its ``model`` name.
    @classmethod
    def from_dict(cls, data: Mapping[str, Any], _path: str = '') -> 'Config':
        data = dict(data)
        if 'model' in data and isinstance(data['model'], dict):
            data['model'] = ModelConfig.resolve(data['model'])
        return super().from_dict(data, _path=_path)

    # ------------------------------------------------------------ helpers
    @property
    def experiment_dir(self) -> Path:
        return Path(self.saving_dir) / self.experiment_name

    def setup_dir(self) -> Path:
        """Create the experiment dir (timestamp-suffixed on collision),
        dump config.yaml, and configure logging.

        Mirrors reference behaviour at src/config/core.py:231-280.
        """
        exp_dir = self.experiment_dir
        if exp_dir.exists() and any(exp_dir.iterdir()):
            stamped = Path(f'{exp_dir}_{int(time.time())}')
            logger.warning('experiment dir %s exists; using %s', exp_dir, stamped)
            exp_dir = stamped
        exp_dir.mkdir(parents=True, exist_ok=True)
        self.to_yaml(exp_dir / 'config.yaml')
        if self.logging:
            self._setup_logging(exp_dir)
        return exp_dir

    def _setup_logging(self, exp_dir: Path) -> None:
        root = logging.getLogger()
        root.setLevel(logging.INFO)
        # one experiment log at a time: drop the previous experiment's file
        # handler, or grid runs in one process cross-contaminate logs (and
        # the report's time parsing reads another experiment's values)
        for h in list(root.handlers):
            if getattr(h, '_mile_tpu_experiment_log', False):
                root.removeHandler(h)
                h.close()
        fmt = logging.Formatter('%(asctime)s %(levelname)s %(name)s: %(message)s')
        fh = logging.FileHandler(exp_dir / 'training.log')
        fh.setFormatter(fmt)
        fh._mile_tpu_experiment_log = True
        root.addHandler(fh)

    def get_model(self):
        """Resolve the configured Flax module from the model registry."""
        from mile_tpu.models import build_model

        return build_model(self.model, data_config=self.data)

    @classmethod
    def list_available_models(cls) -> list[str]:
        return sorted(ModelConfig.registry())

    @classmethod
    def template(cls, model: str = 'FCN') -> dict:
        """Filled-out config template for a given model (reference
        ``Config.template_to_yaml``, src/config/core.py:84-201)."""
        reg = ModelConfig.registry()
        if model not in reg:
            raise ConfigError(
                f'unknown model {model!r}; options: {sorted(reg)}')
        schema = cls.schema()
        schema['model'] = reg[model].schema()
        schema['model']['model'] = model
        schema['saving_dir'] = 'results/'
        schema['experiment_name'] = 'experiment'
        schema['data'] = DataConfig.schema()
        schema['data']['path'] = 'data/airfoil.data'
        return schema

    @classmethod
    def model_template_to_yaml(cls, path, model: str = 'FCN') -> None:
        import yaml

        with open(path, 'w') as f:
            yaml.safe_dump(cls.template(model), f, sort_keys=False)
