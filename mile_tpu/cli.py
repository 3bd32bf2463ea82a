"""Experiment CLI implementation (see repo-root train.py wrapper)."""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _maybe_fake_cpu_devices(n: int) -> None:
    if os.environ.get('JAX_PLATFORMS', '').startswith('cpu') or n <= 1:
        if n > 1:
            flags = os.environ.get('XLA_FLAGS', '')
            os.environ['XLA_FLAGS'] = (
                flags + f' --xla_force_host_platform_device_count={n}').strip()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='train.py',
        description='Train a Bayesian deep ensemble (warmstart + MCMC).',
        epilog='Example: python train.py -c configs/airfoil_mclmc.yaml -d 4',
    )
    parser.add_argument('--config', '-c', required=True,
                        help='config file or directory of configs')
    parser.add_argument('--search_tree', '-s', default=None,
                        help='search-tree YAML for grid expansion')
    parser.add_argument('--devices', '-d', type=int, default=None,
                        help='number of devices for the chain mesh')
    parser.add_argument('--device_limit', type=int, default=None,
                        help='cap on devices used (reference flag parity)')
    parser.add_argument('--jax_cache', default='/tmp/mile_tpu_jax_cache',
                        help='persistent XLA compilation cache dir '
                             '("" to disable)')
    parser.add_argument('--silent', action='store_true',
                        help='disable console logging')
    parser.add_argument('--outer_parallel', action='store_true',
                        help='run grid experiments in parallel processes')
    parser.add_argument('--no_report', action='store_true',
                        help='skip report generation')
    parser.add_argument('--multihost', action='store_true',
                        help='initialize jax.distributed before building the '
                             'chain mesh (TPU pod slices; auto-detects '
                             'coordinator from the environment)')
    args = parser.parse_args(argv)

    if args.devices:
        _maybe_fake_cpu_devices(args.devices)
    if args.device_limit and (args.devices is None
                              or args.devices > args.device_limit):
        args.devices = args.device_limit
    if args.jax_cache:
        import jax

        os.makedirs(args.jax_cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', args.jax_cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    if args.multihost:
        from mile_tpu.parallel.distributed import initialize_distributed

        initialize_distributed()

    if not args.silent:
        logging.basicConfig(level=logging.INFO,
                            format='%(asctime)s %(levelname)s %(message)s')

    from mile_tpu.config import Config

    if not os.path.exists(args.config):
        parser.error(f'config not found: {args.config}')
    configs = Config.from_file(args.config)
    if args.search_tree:
        configs = [v for c in configs
                   for v in c.expand_grid_from_path(args.search_tree)]
    logging.info('running %d experiment(s)', len(configs))

    if args.outer_parallel and len(configs) > 1:
        import multiprocessing as mp

        ctx = mp.get_context('spawn')
        with ctx.Pool(min(len(configs), os.cpu_count() or 1)) as pool:
            pool.starmap(_run_one,
                         [(c, args.devices, args.no_report) for c in configs])
    else:
        for cfg in configs:
            _run_one(cfg, args.devices, args.no_report)
    return 0


def _run_one(config, n_devices, no_report) -> None:
    from mile_tpu.train.trainer import BDETrainer

    trainer = BDETrainer(config, n_devices=n_devices)
    metrics = trainer.train(report=not no_report)
    logging.info('experiment %s finished: %s', config.experiment_name,
                 {k: v for k, v in metrics.items()
                  if isinstance(v, (int, float))})


if __name__ == '__main__':
    sys.exit(main())
