"""Where does bikesharing-NUTS wall-clock go? (VERDICT r2 weak 2 / next 2)

Decomposes the replicate_uci NUTS cost on the chip into its physical
parts instead of guessing:

1. one full-batch value_and_grad of the posterior (the FLOP atom);
2. one leapfrog step (2 grads' worth of work + vector ops);
3. the measured mean NUTS tree size per draw (from a short run's info);
4. window-adaptation wall with/without the r3 cond-gated re-bracketing
   is visible in time.warmstart deltas across rounds; here we time the
   100-step window adaptation as a whole;
5. the full 12-chain × n draws sampling block.

predicted_sampling ≈ draws × mean_tree_steps × leapfrog_time; the gap
to measured is dispatch/egress overhead. Run AFTER the catalogue queue
(strict chip serialization).

Usage: python experiments/profile_nuts.py [--draws 200]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/tmp/mile_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/mile_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mile_tpu.bayes import BayesianModel  # noqa: E402
from mile_tpu.config import (  # noqa: E402
    DataConfig, FCNConfig, PriorDist, Sampler, SamplerConfig, Task,
)
from mile_tpu.bayes.priors import Prior  # noqa: E402
from mile_tpu.data import TabularLoader  # noqa: E402
from mile_tpu.mcmc import nuts  # noqa: E402
from mile_tpu.models import build_model  # noqa: E402
from mile_tpu.train.sampling import run_sampler  # noqa: E402

N_CHAINS = 12


def timed(fn, *args, repeats=3):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / repeats, out


def main(draws: int):
    data_cfg = DataConfig(path='data/bikesharing.data', task=Task.REGRESSION,
                          train_split=0.7, valid_split=0.1, test_split=0.2)
    loader = TabularLoader(data_cfg, 0)
    module = build_model(FCNConfig(hidden_structure=[16, 16, 2]))
    x, y = loader.arrays('train')
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION)
    logdensity = bayes.logdensity_fn(jnp.asarray(x), jnp.asarray(y))
    dim = bayes.dim
    print(f'dim={dim} n_train={x.shape[0]} chains={N_CHAINS}', flush=True)

    with jax.default_matmul_precision('float32'):
        # --- atom 1: full-batch value_and_grad, 12 chains vmapped
        theta = 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                         (N_CHAINS, dim))
        vgrad = jax.jit(jax.vmap(jax.value_and_grad(logdensity)))
        t_grad, _ = timed(vgrad, theta, repeats=10)
        print(f'value_and_grad (12 chains): {t_grad*1e3:.3f} ms', flush=True)

        # --- atom 2: K leapfrogs via a fixed-depth scan
        from mile_tpu.mcmc.integrators import velocity_verlet, EuclideanState

        imm = jnp.ones(dim)
        integ = velocity_verlet(logdensity, imm)
        K = 64

        @jax.jit
        def leapfrogs(theta):
            def one(pos):
                ld, g = jax.value_and_grad(logdensity)(pos)
                z = EuclideanState(pos, jnp.zeros_like(pos) + 0.01, ld, g)

                def body(z, _):
                    return integ(z, jnp.asarray(5e-4)), None

                z, _ = jax.lax.scan(body, z, None, length=K)
                return z.position

            return jax.vmap(one)(theta)

        t_leap, _ = timed(leapfrogs, theta, repeats=3)
        per_leap = t_leap / K
        print(f'leapfrog (12 chains): {per_leap*1e3:.3f} ms/step '
              f'({per_leap/t_grad:.2f}x grad)', flush=True)

    # --- short real NUTS run for tree stats + measured walls
    cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=100, n_chains=N_CHAINS,
                        n_samples=draws, n_thinning=1, step_size_init=0.001)
    t0 = time.perf_counter()
    res = run_sampler(logdensity, cfg, jax.random.PRNGKey(3), theta)
    total = time.perf_counter() - t0
    steps = np.asarray(res.info['num_integration_steps'])
    mean_tree = float(steps.mean())
    total_steps = float(steps.sum())
    predicted = total_steps / N_CHAINS * per_leap
    print(f'NUTS run: {draws} draws x {N_CHAINS} chains in {total:.1f}s '
          f'(incl. 100-step window adaptation + compile-cache hits)',
          flush=True)
    print(f'mean tree size: {mean_tree:.0f} leapfrogs/draw; '
          f'total {total_steps:.0f} leapfrog steps', flush=True)
    print(f'predicted sampling wall from leapfrog atom: {predicted:.1f}s '
          f'-> physics fraction {predicted/total:.0%} of total wall',
          flush=True)
    print(f'acceptance {float(np.mean(res.info["acceptance_rate"])):.3f}, '
          f'divergent {float(np.mean(res.info["is_divergent"])):.3%}, '
          f'eps {np.asarray(res.tuned["step_size"]).round(6).tolist()}',
          flush=True)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--draws', type=int, default=200)
    main(p.parse_args().draws)
