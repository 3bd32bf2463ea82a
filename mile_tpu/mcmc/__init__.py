"""Native MCMC core: kernels, integrators, adaptation, diagnostics."""
from mile_tpu.mcmc import hmc, mclmc, nuts, split_hmc  # noqa: F401
from mile_tpu.mcmc.diagnostics import (  # noqa: F401
    autocovariance,
    effective_sample_size,
    potential_scale_reduction,
)
from mile_tpu.mcmc.integrators import (  # noqa: F401
    IntegratorState,
    isokinetic_leapfrog,
    isokinetic_mclachlan,
    partially_refresh_momentum,
    velocity_verlet,
)
