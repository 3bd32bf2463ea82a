#!/usr/bin/env python
"""Symmetric-split HMC baseline on LeNet / FashionMNIST.

TPU-native counterpart of the reference's external GPU baseline
(/root/reference/experiments/symmetric_splitting.py — hamiltorch
``Integrator.SPLITTING`` with ``Sampler.HMC``): minibatch HMC where each
leapfrog step sweeps the data shards with a palindromic Strang
splitting (see :mod:`mile_tpu.mcmc.split_hmc`), so the gradient never
touches the full dataset at once. Reports majority-vote accuracy and
LPPD on the test set, like the reference script.

Reference hyperparameters (symmetric_splitting.py:66-91): step_size
5e-4, L=30 steps/sample, 3300 samples, burn 299, batch 64, mass 0.01
(inverse mass 100), prior precision tau=1 → standard-normal prior.

Full-scale is paper-scale compute; ``--datapoint-limit`` gives a
smoke-scale run. Examples:

    python experiments/symmetric_splitting.py                 # paper scale
    python experiments/symmetric_splitting.py \
        --datapoint-limit 4096 --num-samples 100 --burn 20    # smoke
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dataset', default='FashionMNIST')
    p.add_argument('--source', default='torchvision',
                   help="'torchvision' or 'local' (.npz with x/y)")
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--step-size', type=float, default=5e-4)
    p.add_argument('--num-steps', type=int, default=30,
                   help='leapfrog steps per proposal')
    p.add_argument('--num-samples', type=int, default=3300)
    p.add_argument('--burn', type=int, default=299)
    p.add_argument('--mass', type=float, default=0.01)
    p.add_argument('--datapoint-limit', type=int, default=None)
    p.add_argument('--eval-limit', type=int, default=None,
                   help='cap test points for evaluation')
    p.add_argument('--seed', type=int, default=123)
    args = p.parse_args(argv)

    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import (DataConfig, DatasetType, PriorDist, Source,
                                 Task)
    from mile_tpu.config.models import LeNetConfig
    from mile_tpu.data.image import ImageLoader
    from mile_tpu.inference.metrics import lppd, pointwise_lppd
    from mile_tpu.mcmc import split_hmc
    from mile_tpu.models import build_model

    data_cfg = DataConfig(
        path=args.dataset,
        source=Source.TORCHVISION if args.source == 'torchvision'
        else Source.LOCAL,
        data_type=DatasetType.IMAGE,
        task=Task.CLASSIFICATION,
        datapoint_limit=args.datapoint_limit,
        # reference: 54k train / 6k valid / 10k test = 77/9/14
        train_split=0.77, valid_split=0.09, test_split=0.14,
    )
    loader = ImageLoader(data_cfg, 0)
    x_train, y_train = loader.arrays('train')
    x_test, y_test = loader.arrays('test')
    if args.eval_limit:
        x_test, y_test = x_test[:args.eval_limit], y_test[:args.eval_limit]

    module = build_model(LeNetConfig(out_dim=10))
    template = module.init(jax.random.PRNGKey(args.seed), x_train[:1])[
        'params']
    # tau = 1 prior precision (reference line 75) = standard normal
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.CLASSIFICATION)

    B = args.batch_size
    M = int(x_train.shape[0]) // B
    xs = x_train[: M * B].reshape(M, B, *x_train.shape[1:])
    ys = y_train[: M * B].reshape(M, B)
    shard_potential = bayes.shard_potential_fn(xs, ys)

    kernel = split_hmc.build_kernel(shard_potential, M,
                                    num_integration_steps=args.num_steps)
    inv_mass = jnp.full(bayes.dim, 1.0 / args.mass, jnp.float32)
    eps = jnp.float32(args.step_size)

    theta0 = bayes.flatten(template)
    state = split_hmc.init(theta0, shard_potential, M)
    print(f'dim={bayes.dim} shards={M} batch={B} '
          f'train={int(x_train.shape[0])} test={int(x_test.shape[0])}')

    @jax.jit
    def one(state, key):
        state, info = kernel(key, state, eps, inv_mass)
        return state, (state.position, info.is_accepted)

    # python-level draw loop: one proposal = 2·M·L shard grads, plenty of
    # work per dispatch; positions stream to host each draw (O(dim) each)
    keys = jax.random.split(jax.random.PRNGKey(args.seed),
                            args.num_samples)
    draws, accepts = [], []
    t0 = time.time()
    for i in range(args.num_samples):
        state, (pos, acc) = one(state, keys[i])
        if i >= args.burn:
            draws.append(np.asarray(pos))
        accepts.append(bool(acc))
        if (i + 1) % 50 == 0:
            print(f'sample {i + 1}/{args.num_samples} '
                  f'acc_rate={np.mean(accepts):.3f} '
                  f'({time.time() - t0:.1f}s)', flush=True)
    sampling_time = time.time() - t0
    draws = jnp.asarray(np.stack(draws))  # (S, dim)

    # posterior predictive on test set, vmapped over samples (SURVEY §7.1:
    # batched module.apply instead of the reference's python loop)
    @jax.jit
    def logits_for(theta):
        return module.apply({'params': bayes.unravel(theta)}, x_test)

    logits = jax.lax.map(logits_for, draws)          # (S, n_test, 10)
    votes = jnp.argmax(logits, axis=-1)              # (S, n_test)
    onehot = jax.nn.one_hot(votes, 10).sum(0)        # majority vote
    majority = jnp.argmax(onehot, axis=-1)
    accuracy = float(jnp.mean(majority == y_test))
    # lppd over (chain=1, sample) axes — pointwise_lppd adds the chain axis
    pw = pointwise_lppd(logits, y_test, Task.CLASSIFICATION)
    test_lppd = float(lppd(pw))

    result = {
        'accuracy': accuracy,
        'lppd': test_lppd,
        'acceptance_rate': float(np.mean(accepts)),
        'n_samples': int(draws.shape[0]),
        'sampling_time_s': round(sampling_time, 1),
    }
    print(f'Accuracy: {accuracy}')
    print(f'LPPD: {test_lppd}')
    print(json.dumps(result))
    return result


if __name__ == '__main__':
    main()
