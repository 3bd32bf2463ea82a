"""MILE-TPU: a TPU-native framework for Bayesian deep learning via ensemble MCMC.

A ground-up reimplementation of the capabilities of MILE (Microcanonical
Langevin Ensembles, ICLR 2025 — reference implementation at
zhiyuan-yang/MILE) designed TPU-first:

- Chains are a *batch axis*, not a device loop: every MCMC kernel is written
  single-chain over a flat parameter vector and lifted with ``jax.vmap``,
  then sharded over a ``jax.sharding.Mesh`` ``('chains',)`` axis. Any number
  of chains runs in ONE compiled program regardless of device count
  (the reference loops Python ``train_plan`` batches of ``pmap``,
  reference ``src/training/trainer.py:75-82``).
- The full warmup + sampling pipeline is a single ``jit``-compiled
  ``lax.scan`` program; samples accumulate in device-side thinned buffers
  instead of per-step host callbacks (reference ``src/training/callbacks.py``).
- The MCMC core (MCLMC with isokinetic McLachlan integration, NUTS, HMC,
  Stan-style window adaptation, energy-variance step-size tuning) is
  implemented natively here — the reference outsources it to BlackJAX.
- Posterior-predictive evaluation is vmapped over (chain, sample) on device
  (the reference uses a Python loop, ``src/inference/evaluation.py:37-43``).
"""

__version__ = '0.1.0'

from mile_tpu.config import Config  # noqa: F401
