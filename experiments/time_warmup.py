"""Micro-timing of NUTS window adaptation (VERDICT r2 weak 1 / next 2).

Times ``run_window_adaptation`` (vmapped over chains) on a real UCI
posterior — the quantity the cond-gated re-bracketing change targets.
Run on old/new code (git stash) to measure the warmup wall reduction.

Usage: python experiments/time_warmup.py [warmup_steps] [n_chains] [--cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if '--cpu' in sys.argv:
    sys.argv.remove('--cpu')
    import jax
    jax.config.update('jax_platforms', 'cpu')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mile_tpu.bayes import BayesianModel  # noqa: E402
from mile_tpu.config.data import DataConfig, Task  # noqa: E402
from mile_tpu.config.models import FCNConfig  # noqa: E402
from mile_tpu.config.training import PriorConfig  # noqa: E402
from mile_tpu.data import build_loader  # noqa: E402
from mile_tpu.mcmc import nuts  # noqa: E402
from mile_tpu.mcmc.adaptation.window import run_window_adaptation  # noqa: E402


def main(warmup_steps=500, n_chains=8):
    data_cfg = DataConfig(path='data/bikesharing.data', data_type='tabular',
                          task='regr', datapoint_limit=800)
    loader = build_loader(data_cfg, 0)
    from mile_tpu.models import build_model
    module = build_model(FCNConfig(hidden_structure=[16, 16, 2]),
                         data_config=data_cfg)
    x, y = loader.arrays('train')
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bm = BayesianModel(module, template, PriorConfig().build(),
                       Task.REGRESSION)
    logdensity = bm.logdensity_fn(jnp.asarray(x), jnp.asarray(y))
    print(f'dim={bm.dim} n_train={x.shape[0]} '
          f'warmup_steps={warmup_steps} chains={n_chains}')

    flat0 = bm.flatten(template)
    init = jnp.stack([flat0 + 0.01 * jax.random.normal(
        jax.random.PRNGKey(i), flat0.shape) for i in range(n_chains)])

    def warmup_one(position, k):
        state = nuts.init(position, logdensity)
        return run_window_adaptation(
            nuts.build_kernel(logdensity), state, k, warmup_steps,
            initial_step_size=0.005, logdensity_fn=logdensity)

    with jax.default_matmul_precision('float32'):
        fn = jax.jit(jax.vmap(warmup_one))
        keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
        t0 = time.time()
        out = jax.block_until_ready(fn(init, keys))
        compile_and_run = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(fn(init, keys))
        run = time.time() - t0
    print(f'compile+run={compile_and_run:.2f}s  run={run:.2f}s  '
          f'eps={np.asarray(out[1])}')


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
