"""Experiment-level PRNG key derivation.

One root key per experiment (``config.rng``), split ONCE into the four
phase keys. Shared by the trainer and by standalone post-hoc reporting so
a rebuilt loader reproduces the exact data split of the original run.
"""
from __future__ import annotations

from typing import NamedTuple

import jax


class ExperimentKeys(NamedTuple):
    loader: jax.Array
    init: jax.Array
    train: jax.Array
    sample: jax.Array


def experiment_keys(rng: int) -> ExperimentKeys:
    return ExperimentKeys(*jax.random.split(jax.random.PRNGKey(rng), 4))
