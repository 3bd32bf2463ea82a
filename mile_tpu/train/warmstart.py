"""Deep-ensemble warmstart training (one member per future MCMC chain).

Reference: /root/reference/src/training/trainer.py:329-538,662-952. The
reference trains members in pmap batches of ``n_devices`` with a Python
``train_plan`` loop; here ALL members train simultaneously — the member
axis is a vmapped batch axis sharded over the ``chains`` mesh axis, and a
whole epoch of minibatch SGD is one compiled ``lax.scan``. Early-stopped
members keep stepping as masked no-ops inside the program (the reference
does the same inside pmap via ``lax.cond``).
"""
from __future__ import annotations

import logging
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mile_tpu.config.data import Task
from mile_tpu.config.training import WarmstartConfig
from mile_tpu.inference.metrics import (
    ClassificationMetrics,
    Metrics,
    MetricsStore,
    RegressionMetrics,
    gaussian_nlll,
    squared_error,
)
from mile_tpu.parallel.mesh import chain_axis_sharding, shard_chains

logger = logging.getLogger(__name__)


class EnsembleState(NamedTuple):
    params: dict        # member-stacked ParamTree (leading axis = member)
    opt_state: tuple    # member-stacked optimizer state
    epoch: int


# ------------------------------------------------------------ loss/metrics
def _regr_loss(lvals: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    sigma = jnp.clip(jnp.exp(lvals[..., 1]), 1e-6, 1e6)
    return gaussian_nlll(y, lvals[..., 0], sigma).mean()


def _class_loss(lvals: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(
        lvals, y.astype(jnp.int32)).mean()


def _regr_metrics(lvals, y, step):
    sigma = jnp.clip(jnp.exp(lvals[..., 1]), 1e-6, 1e6)
    return RegressionMetrics(
        step=step,
        nlll=gaussian_nlll(y, lvals[..., 0], sigma).mean(),
        rmse=jnp.sqrt(squared_error(y, lvals[..., 0]).mean()),
    )


def _class_metrics(lvals, y, step):
    y = y.astype(jnp.int32)
    return ClassificationMetrics(
        step=step,
        cross_entropy=optax.softmax_cross_entropy_with_integer_labels(
            lvals, y).mean(),
        accuracy=jnp.mean(jnp.argmax(lvals, axis=-1) == y),
    )


def task_fns(task: Task) -> tuple[Callable, Callable, type]:
    if task == Task.REGRESSION:
        return _regr_loss, _regr_metrics, RegressionMetrics
    return _class_loss, _class_metrics, ClassificationMetrics


def earlystop_mask(losses: np.ndarray, patience: int | None) -> np.ndarray:
    """Per-member stop decision from the validation-loss history.

    ``losses``: (n_members, n_epochs). Stop when the last ``patience``
    losses never improved on the loss ``patience+1`` epochs ago
    (reference semantics, trainer.py:920-938).
    """
    n_members, n_epochs = losses.shape
    if patience is None or n_epochs < patience + 1:
        return np.zeros(n_members, dtype=bool)
    reference = losses[:, -(patience + 1)][:, None]
    recent = losses[:, -patience:]
    return np.all(recent >= reference, axis=1)


# ---------------------------------------------------------------- training
def init_ensemble(module, x_sample, n_members: int, rng: jax.Array,
                  tx: optax.GradientTransformation, mesh=None) -> EnsembleState:
    keys = jax.random.split(rng, n_members)
    params = jax.vmap(lambda k: module.init(k, x_sample)['params'])(keys)
    opt_state = jax.vmap(tx.init)(params)
    if mesh is not None:
        params = shard_chains(params, mesh)
        opt_state = shard_chains(opt_state, mesh)
    return EnsembleState(params=params, opt_state=opt_state, epoch=0)


def train_ensemble(
    module,
    loader,
    config: WarmstartConfig,
    task: Task,
    n_members: int,
    rng: jax.Array,
    mesh=None,
) -> tuple[dict, MetricsStore]:
    """Train ``n_members`` networks; returns (stacked params, metrics).

    One jitted program per epoch: ``lax.scan`` over minibatches of a
    member-vmapped SGD step. Early stopping is evaluated on host between
    epochs from per-member validation losses.
    """
    loss_fn, metrics_fn, metrics_cls = task_fns(task)
    tx = config.optimizer_config.build()

    x_train, _ = loader.arrays('train')
    if config.partition_warmstart:
        # train only input/output layers (reference trainer.py:890-901)
        from mile_tpu.bayes.partition import partition_optimizer

        template = module.init(rng, x_train[:1])['params']
        tx = partition_optimizer(tx, template)
    state = init_ensemble(module, x_train[:1], n_members, rng, tx, mesh)

    x_all, y_all = loader.arrays('train')

    def member_step(params, opt_state, stop, row_ids):
        # device-side gather: each member trains on its own batch rows
        x, y = x_all[row_ids], y_all[row_ids]

        def lf(p):
            lvals = module.apply({'params': p}, x)
            return loss_fn(lvals, y)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(stop, b, a), new, old)
        return keep(new_params, params), keep(new_opt, opt_state), \
            jnp.where(stop, jnp.nan, loss)

    @jax.jit
    def run_epoch(params, opt_state, stop, batch_plan):
        # batch_plan: (n_members, n_batches, B) row indices
        def scan_step(carry, idx_b):
            params, opt_state = carry
            params, opt_state, loss = jax.vmap(
                member_step, in_axes=(0, 0, 0, 0)
            )(params, opt_state, stop, idx_b)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            scan_step, (params, opt_state),
            jnp.swapaxes(batch_plan, 0, 1))
        return params, opt_state, losses.mean(axis=0)  # (n_members,)

    @jax.jit
    def evaluate(params, x, y, epoch):
        return jax.vmap(
            lambda p: metrics_fn(module.apply({'params': p}, x), y, epoch)
        )(params)

    x_valid, y_valid = loader.arrays('valid')
    has_valid = x_valid.shape[0] > 0
    batch_size = config.batch_size or x_train.shape[0]

    valid_losses: list[np.ndarray] = []
    stop = jnp.zeros(n_members, dtype=bool)
    train_hist, valid_hist = [], []

    params, opt_state = state.params, state.opt_state
    for epoch in range(config.max_epochs):
        plan = jnp.asarray(
            loader.epoch_batch_indices(batch_size, n_members))
        params, opt_state, train_loss = run_epoch(params, opt_state, stop,
                                                  plan)
        x_tr, y_tr = loader.arrays('train')
        train_hist.append(evaluate(params, x_tr, y_tr, epoch))
        if has_valid:
            vm = evaluate(params, x_valid, y_valid, epoch)
            valid_hist.append(vm)
            key = 'nlll' if task == Task.REGRESSION else 'cross_entropy'
            valid_losses.append(np.asarray(getattr(vm, key)))
            stop_np = earlystop_mask(np.stack(valid_losses, axis=1),
                                     config.patience)
            stop = jnp.asarray(stop_np)
            if stop_np.all():
                logger.info('all members early-stopped at epoch %d', epoch)
                break

    x_te, y_te = loader.arrays('test')
    test_metrics = (evaluate(params, x_te, y_te, 0)
                    if x_te.shape[0] > 0 else metrics_cls.empty())

    store = MetricsStore(
        train=metrics_cls.cstack(train_hist) if train_hist
        else metrics_cls.empty(),
        valid=metrics_cls.cstack(valid_hist) if valid_hist
        else metrics_cls.empty(),
        test=test_metrics,
    )
    return params, store
