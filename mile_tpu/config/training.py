"""Training-phase configuration: warmstart optimizer, sampler, tokenizer.

Reference: /root/reference/src/config/{warmstart,sampler,training}.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

from mile_tpu.config.base import BaseConfig, CfgEnum, ConfigError


# --------------------------------------------------------------- warmstart
class Optimizer(CfgEnum):
    ADAMW = 'adamw'
    ADAM = 'adam'
    SGD = 'sgd'

    def build(self, parameters: dict):
        import optax

        return getattr(optax, self.value)(**parameters)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig(BaseConfig):
    name: Optimizer = Optimizer.ADAMW
    parameters: dict[str, Any] = dataclasses.field(
        default_factory=lambda: {'learning_rate': 1e-3})

    def build(self):
        return self.name.build(self.parameters)


@dataclasses.dataclass(frozen=True)
class WarmstartConfig(BaseConfig):
    """Deep-ensemble (frequentist) pre-training of the chain initializers."""

    include: bool = True
    optimizer_config: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    warmstart_exp_dir: Optional[str] = None
    max_epochs: int = 100
    batch_size: Optional[int] = None
    patience: Optional[int] = None
    partition_warmstart: bool = False


# ----------------------------------------------------------------- priors
class PriorDist(CfgEnum):
    NORMAL = 'Normal'
    STANDARD_NORMAL = 'StandardNormal'
    LAPLACE = 'Laplace'


@dataclasses.dataclass(frozen=True)
class PriorConfig(BaseConfig):
    name: PriorDist = PriorDist.STANDARD_NORMAL
    parameters: dict[str, Any] = dataclasses.field(default_factory=dict)

    def build(self):
        from mile_tpu.bayes.priors import Prior

        return Prior.from_name(self.name, **self.parameters)


# ---------------------------------------------------------------- sampler
class Sampler(CfgEnum):
    NUTS = 'nuts'
    HMC = 'hmc'
    MCLMC = 'mclmc'


@dataclasses.dataclass(frozen=True)
class SamplerConfig(BaseConfig):
    """MCMC sampling-phase knobs.

    MCLMC tuning fields mirror the reference's BNN-adapted adaptation
    (/root/reference/src/config/sampler.py:119-186, src/training/warmup.py).
    """

    name: Sampler = Sampler.MCLMC
    epoch_wise_sampling: bool = False
    params_frozen: list[str] = dataclasses.field(default_factory=list)
    warmup_steps: int = 1000
    n_chains: int = 4
    n_samples: int = 1000
    use_warmup_as_init: bool = True
    n_thinning: int = 1
    diagonal_preconditioning: bool = False
    desired_energy_var_start: float = 5e-4
    desired_energy_var_end: float = 5e-4
    trust_in_estimate: float = 1.5
    num_effective_samples: int = 100
    step_size_init: float = 0.005
    keep_warmup: bool = False
    prior_config: PriorConfig = dataclasses.field(default_factory=PriorConfig)
    partition_sampling: bool = False
    # TPU-native extras (absent in reference):
    stream_samples: bool = False   # per-draw host streaming (parity mode)
    # persist sampler state per egress chunk so a preempted run resumes
    # mid-chain without re-warmup (all samplers; reference cannot resume)
    checkpoint_sampling: bool = False
    # chunk+remat the log-likelihood over observations (None = full batch);
    # bounds HBM for large image datasets at the cost of recompute
    likelihood_chunk_size: Optional[int] = None
    # run the network forward in this dtype ('bfloat16' targets the MXU's
    # native rate) while likelihood/prior/energy accounting stay float32
    compute_dtype: Optional[str] = None
    # MCLMC-only: force every matmul in the sampling runtime to this XLA
    # precision ('float32' = 6-pass exact f32; None = TPU default bf16
    # passes). The HMC/NUTS runtime always forces float32 (the MH test
    # needs exact energies); MCLMC has no accept step, so the default is
    # the fast path — this knob exists for the round-5 dtype A/B
    # (VERDICT r4 next 4) and as an exactness preset.
    matmul_precision: Optional[str] = None
    # MCLMC-only: matmul precision for the TUNER (warmup) phase; None =
    # follow matmul_precision. DEFAULT 'float32' since round 5: the
    # on-chip A/B (aggr_results/aggr_dtype_ab.csv, airfoil x 3 seeds)
    # showed TPU bf16 matmul noise inflates the tuner's measured energy
    # variance ~7x, collapsing tuned eps 0.038 -> 0.005 (L 12 -> 2.3)
    # and costing ~0.05-0.07 LPPD — while the unadjusted sampling phase
    # never reads energies, so it keeps full bf16-pass speed (f32tune
    # arm: LPPD 0.720 vs 0.676 default at equal-or-lower sampling wall).
    # The reference's CPU BlackJAX stack tunes in exact f32, so this is
    # also the parity-correct behavior. Set `warmup_matmul_precision:
    # null` in YAML to follow matmul_precision (old fast-tuner behavior).
    warmup_matmul_precision: Optional[str] = 'float32'
    # HMC-only: number of leapfrog steps per proposal.
    num_integration_steps: int = 32
    # NUTS/HMC-only: dual-averaging acceptance target for window
    # adaptation. Default 0.9 from the round-4 on-chip sweep
    # (aggr_results/aggr_nuts_ta.csv, bikesharing FCN [16,16,16,2] x 3
    # seeds): equal LPPD to the Stan/BlackJAX-default 0.8 (0.683+-0.039
    # vs 0.700+-0.033) with 10-20x fewer divergent draws (64/12k vs
    # 880-1592/12k); 0.95 buys nothing further. Set 0.8 to mirror the
    # reference's implicit BlackJAX default exactly.
    target_acceptance: float = 0.9
    # NUTS-only: max tree doublings per draw (BlackJAX name; tree caps at
    # 2^max_num_doublings - 1 leapfrogs). The default 10 matches the
    # reference's BlackJAX stack; lower values bound per-draw latency and
    # are the first mitigation lever for the remote 48-width/protein
    # kernel fault (VERDICT r4 next 2).
    max_num_doublings: int = 10
    # NUTS-only: tree-doubling cap for the WARMUP (window adaptation)
    # phase only; None = same as max_num_doublings. The round-5 fault
    # probe (aggr_results/nuts_fault_probe.jsonl) localized the remote
    # TPU kernel fault to the vmapped window-adaptation program at
    # depth 10 on wide/large posteriors — fixed-eps depth-10 sampling of
    # the same posteriors is fine, and capping only the warmup trees at 8
    # runs every previously-faulting cell while keeping full-depth draws
    # (docs/RESULTS.md round 5).
    warmup_max_num_doublings: Optional[int] = None
    # devices along a second mesh axis sharding the TRAINING SET within
    # each chain group (log-lik contributions psum'd over ICI by GSPMD);
    # lets n_chains < n_devices use every chip. 1 = chain axis only.
    data_sharding: int = 1
    # MCLMC-only: 'mclachlan' (XLA, default) or 'mclachlan_pallas' (fused
    # VMEM state updates + on-chip PRNG refresh; measured win only in the
    # bandwidth-bound large-dim regime — see ops/isokinetic.py docstring)
    integrator: str = 'mclachlan'

    def build_kernel(self, logdensity_fn):
        """Resolve the kernel factory (reference registry parity,
        src/training/kernels/__init__.py:14-20)."""
        from mile_tpu.mcmc import hmc, mclmc, nuts

        if self.name == Sampler.MCLMC:
            return mclmc.build_kernel(logdensity_fn,
                                      integrator=self.integrator)
        if self.name == Sampler.NUTS:
            return nuts.build_kernel(logdensity_fn,
                                     max_depth=self.max_num_doublings)
        return hmc.build_kernel(
            logdensity_fn, num_integration_steps=self.num_integration_steps)

    def __post_init__(self):
        if self.warmup_steps <= 0:
            raise ConfigError('sampler.warmup_steps must be > 0')
        if self.n_chains <= 0 or self.n_samples <= 0:
            raise ConfigError('sampler.n_chains and n_samples must be > 0')
        if self.n_thinning < 1:
            raise ConfigError('sampler.n_thinning must be >= 1')
        if self.data_sharding < 1:
            raise ConfigError('sampler.data_sharding must be >= 1')
        if not 0.0 < self.target_acceptance < 1.0:
            raise ConfigError('sampler.target_acceptance must be in (0, 1)')
        if not 1 <= self.max_num_doublings <= 20:
            raise ConfigError(
                'sampler.max_num_doublings must be in [1, 20]')
        if (self.warmup_max_num_doublings is not None
                and not 1 <= self.warmup_max_num_doublings <= 20):
            raise ConfigError(
                'sampler.warmup_max_num_doublings must be in [1, 20]')
        for field in ('matmul_precision', 'warmup_matmul_precision'):
            val = getattr(self, field)
            if val not in (None, 'float32', 'bfloat16', 'tensorfloat32'):
                raise ConfigError(
                    f"sampler.{field} must be one of None/'float32'/"
                    f"'bfloat16'/'tensorfloat32', got {val!r}")
        if self.integrator not in ('mclachlan', 'mclachlan_pallas'):
            raise ConfigError(
                "sampler.integrator must be 'mclachlan' or "
                f"'mclachlan_pallas', got {self.integrator!r}")


# -------------------------------------------------------------- tokenizer
class TokenizerName(CfgEnum):
    CUSTOM_BPE = 'custom_bpe'
    BPE = 'bpe'
    BERT = 'bert'
    SINGLE_CHAR = 'single_char'


@dataclasses.dataclass(frozen=True)
class TokenizerConfig(BaseConfig):
    name: TokenizerName = TokenizerName.SINGLE_CHAR
    parameters: dict[str, Any] = dataclasses.field(default_factory=dict)


# ------------------------------------------------------------------- root
@dataclasses.dataclass(frozen=True)
class TrainingConfig(BaseConfig):
    warmstart: WarmstartConfig = dataclasses.field(default_factory=WarmstartConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)
    tokenizer: Optional[TokenizerConfig] = None
    #: 'npz' (host-local, report interface) or 'orbax' (sharded,
    #: multi-host-capable: each process writes its own shards of the
    #: warmstart ensemble and sampler state)
    checkpoint_format: str = 'npz'

    def __post_init__(self):
        if self.checkpoint_format not in ('npz', 'orbax'):
            raise ConfigError(
                "training.checkpoint_format must be 'npz' or 'orbax', "
                f'got {self.checkpoint_format!r}')
