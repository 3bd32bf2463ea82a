"""Deep-ensemble warmstart training (one member per future MCMC chain).

Reference: /root/reference/src/training/trainer.py:329-538,662-952. The
reference trains members in pmap batches of ``n_devices`` with Python
loops over epochs and minibatches; here the ENTIRE training run — every
epoch, every minibatch, per-member early stopping — is ONE compiled
program: a ``lax.while_loop`` over epochs around a ``lax.scan`` over
minibatches of a member-vmapped SGD step, with the member axis sharded
over the ``chains`` mesh axis. The host uploads a precomputed index plan
(per-member batch permutations, reference semantics of per-device splits)
and downloads the final parameters + metric histories once.

Train metrics are recorded per minibatch STEP from each step's own
forward pass (reference trainer.py:438-457); validation metrics per
epoch (reference trainer.py:462-501).
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
    MetricsStore,
    RegressionMetrics,
    gaussian_nlll,
    squared_error,
)
from mile_tpu.parallel.mesh import shard_chains

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


def _earlystop_jax(vhist: jnp.ndarray, epoch: jnp.ndarray,
                   patience: int) -> jnp.ndarray:
    """In-program early stopping: vhist (members, max_epochs) filled up to
    and including ``epoch``. Same semantics as :func:`earlystop_mask`."""
    m = vhist.shape[0]
    start = jnp.maximum(epoch - patience, 0)  # index of the reference loss
    ref = jax.lax.dynamic_slice(vhist, (0, start), (m, 1))
    recent = jax.lax.dynamic_slice(vhist, (0, start + 1), (m, patience))
    stop = jnp.all(recent >= ref, axis=1)
    return jnp.where(epoch >= patience, stop, False)


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
    """Train ``n_members`` networks; returns (stacked params, metrics)."""
    loss_fn, metrics_fn, metrics_cls = task_fns(task)
    tx = config.optimizer_config.build()

    x_all, y_all = loader.arrays('train')
    if config.partition_warmstart:
        # train only input/output layers (reference trainer.py:890-901)
        from mile_tpu.bayes.partition import partition_optimizer

        template = module.init(rng, x_all[:1])['params']
        tx = partition_optimizer(tx, template)
    state = init_ensemble(module, x_all[:1], n_members, rng, tx, mesh)

    x_valid, y_valid = loader.arrays('valid')
    has_valid = x_valid.shape[0] > 0
    batch_size = config.batch_size or x_all.shape[0]
    max_epochs = config.max_epochs
    patience = config.patience if (config.patience and has_valid) else None

    n_train = int(x_all.shape[0])
    n_batches = max(1, n_train // batch_size)

    def epoch_plan(plan_key, epoch: jnp.ndarray) -> jnp.ndarray:
        """Per-member batch permutations, generated ON DEVICE per epoch:
        (members, n_batches, B). Each member sees its own data ordering
        (reference per-device splits, src/dataset/tabular.py:193-197)
        without a host-materialized O(E·M·N) index plan."""
        keys = jax.random.split(jax.random.fold_in(plan_key, epoch),
                                n_members)
        perm = jax.vmap(lambda k: jax.random.permutation(k, n_train))(keys)
        return perm[:, : n_batches * batch_size].reshape(
            n_members, n_batches, batch_size)

    metric_keys = [k for k in metrics_cls.__dataclass_fields__
                   if k != 'step']
    valid_key = 'nlll' if task == Task.REGRESSION else 'cross_entropy'

    def member_step(params, opt_state, stop, row_ids):
        x, y = x_all[row_ids], y_all[row_ids]

        def lf(p):
            lvals = module.apply({'params': p}, x)
            return loss_fn(lvals, y), lvals

        (_, lvals), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(stop, b, a), new, old)
        # per-STEP minibatch metrics from the step's own forward pass
        # (pre-update logits, reference trainer.py:438-457)
        m = metrics_fn(lvals, y, 0)
        batch_metrics = {k: jnp.where(stop, jnp.nan, getattr(m, k))
                         for k in metric_keys}
        return keep(new_params, params), keep(new_opt, opt_state), \
            batch_metrics

    def eval_members(params, x, y, epoch):
        return jax.vmap(
            lambda p: metrics_fn(module.apply({'params': p}, x), y, epoch)
        )(params)

    class Carry(NamedTuple):
        params: dict
        opt_state: tuple
        stop: jnp.ndarray                  # (members,) bool
        epoch: jnp.ndarray
        plan_key: jax.Array
        train_hist: dict                   # key -> (members, E·n_batches)
        valid_hist: dict                   # key -> (members, E)

    def one_epoch(c: Carry) -> Carry:
        idx_e = epoch_plan(c.plan_key, c.epoch)  # (members, n_batches, B)

        def scan_step(carry, idx_b):
            params, opt_state = carry
            params, opt_state, bm = jax.vmap(
                member_step, in_axes=(0, 0, 0, 0)
            )(params, opt_state, c.stop, idx_b)
            return (params, opt_state), bm

        (params, opt_state), batch_m = jax.lax.scan(
            scan_step, (c.params, c.opt_state),
            jnp.swapaxes(idx_e, 0, 1))  # batch_m: key -> (n_batches, members)

        train_hist = {
            k: jax.lax.dynamic_update_slice(
                c.train_hist[k], batch_m[k].T, (0, c.epoch * n_batches))
            for k in metric_keys}

        if has_valid:
            vm = eval_members(params, x_valid, y_valid, c.epoch)
            valid_hist = {
                k: c.valid_hist[k].at[:, c.epoch].set(getattr(vm, k))
                for k in metric_keys}
            stop = (c.stop | _earlystop_jax(
                valid_hist[valid_key], c.epoch, patience)
                if patience else c.stop)
        else:
            valid_hist, stop = c.valid_hist, c.stop

        return Carry(params, opt_state, stop, c.epoch + 1, c.plan_key,
                     train_hist, valid_hist)

    @jax.jit
    def train_all(params, opt_state, plan_key):
        # plan_key is an ARGUMENT, not a closure constant — otherwise every
        # seed in a sweep would recompile the whole program
        hist = lambda cols: {k: jnp.full((n_members, cols), jnp.nan)
                             for k in metric_keys}
        init = Carry(params, opt_state,
                     jnp.zeros(n_members, dtype=bool),
                     jnp.asarray(0, jnp.int32), plan_key,
                     hist(max_epochs * n_batches), hist(max_epochs))
        out = jax.lax.while_loop(
            lambda c: (c.epoch < max_epochs) & ~jnp.all(c.stop),
            one_epoch, init)
        return out

    out = jax.block_until_ready(train_all(
        state.params, state.opt_state, jax.random.fold_in(rng, 1)))
    epochs_done = int(out.epoch)
    logger.info('warmstart finished after %d epoch(s)', epochs_done)

    def to_metrics(hist: dict, cols: int) -> 'metrics_cls':
        if cols == 0:
            return metrics_cls.empty()
        step = jnp.tile(jnp.arange(cols), (n_members, 1))
        return metrics_cls(step=step, **{
            k: hist[k][:, :cols] for k in metric_keys})

    store = MetricsStore(
        train=to_metrics(out.train_hist, epochs_done * n_batches),
        valid=to_metrics(out.valid_hist, epochs_done) if has_valid
        else metrics_cls.empty(),
        test=(eval_members(out.params, *loader.arrays('test'), 0)
              if loader.arrays('test')[0].shape[0] > 0
              else metrics_cls.empty()),
    )
    return out.params, store
