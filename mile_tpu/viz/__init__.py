"""Visualization of samples, diagnostics, and training curves."""
from mile_tpu.viz.samples import (  # noqa: F401
    plot_effective_sample_size,
    plot_lppd,
    plot_param_hist,
    plot_param_movement,
    plot_pca,
    plot_split_chain_r_hat,
    plot_variances,
    plot_warmstart_results,
)
