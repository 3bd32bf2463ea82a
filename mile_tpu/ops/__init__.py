"""Pallas TPU kernels (opt-in; see mile_tpu.ops.isokinetic for guidance)."""
from mile_tpu.ops.isokinetic import (  # noqa: F401
    fused_momentum_update,
    fused_refresh,
    on_tpu,
    pad_dim,
)
