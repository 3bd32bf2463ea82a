"""No-U-Turn Sampler (iterative, multinomial, Stan-style).

The reference consumes NUTS from BlackJAX; this is a native XLA-friendly
implementation:

- ITERATIVE tree building (no recursion): the doubling loop is a
  ``lax.while_loop``; each doubling runs ``2^depth`` leapfrog steps in an
  inner ``while_loop`` with progressive multinomial proposal sampling.
- Sub-U-turn detection uses the O(max_depth) checkpoint scheme (Phan &
  Pradhan's iterative NUTS, as in numpyro): momenta and momentum prefix
  sums are checkpointed at odd leaves; at even leaves every complete
  binary subtree ending there is checked against its stored left
  boundary. Slot arithmetic: for 1-based leaf ``n``, store at slot
  ``popcount(n-1)`` when n is odd; when n is even check slots
  ``popcount(n-1)-1 - tz(n) + 1 .. popcount(n-1)-1``.
- Static shapes throughout: checkpoint buffers are (max_depth, dim).

Flat-vector, single-chain; vmap lifts the chain axis.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mile_tpu.mcmc.hmc import HMCState, sample_momentum
from mile_tpu.mcmc.integrators import (
    EuclideanState,
    euclidean_kinetic_energy,
    velocity_verlet,
)

NUTSState = HMCState

DIVERGENCE_THRESHOLD = 1000.0


class NUTSInfo(NamedTuple):
    acceptance_rate: jnp.ndarray       # mean leaf MH prob (dual-avg statistic)
    is_divergent: jnp.ndarray
    is_turning: jnp.ndarray
    energy: jnp.ndarray
    num_integration_steps: jnp.ndarray
    num_trajectory_expansions: jnp.ndarray


def init(position: jnp.ndarray, logdensity_fn: Callable) -> NUTSState:
    logdensity, grad = jax.value_and_grad(logdensity_fn)(position)
    return NUTSState(position, logdensity, grad)


def _popcount(n: jnp.ndarray) -> jnp.ndarray:
    n = n.astype(jnp.uint32)
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return ((n * 0x01010101) >> 24).astype(jnp.int32)


def _trailing_zeros(n: jnp.ndarray) -> jnp.ndarray:
    """tz(n) for n >= 1 via popcount identity tz(n) = popcount((n & -n) - 1)."""
    n = n.astype(jnp.int32)
    return _popcount((n & -n) - 1)


class _SubtreeCarry(NamedTuple):
    leaf: jnp.ndarray              # 1-based leaf counter within subtree
    z: EuclideanState              # integrator frontier
    prop_state: EuclideanState     # proposal (progressive multinomial)
    log_sum_w: jnp.ndarray         # subtree multinomial weight
    psum: jnp.ndarray              # subtree momentum sum
    ckpt_p: jnp.ndarray            # (max_depth, dim) boundary momenta
    ckpt_psum: jnp.ndarray         # (max_depth, dim) prefix sums before leaf
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray        # sum of per-leaf min(1, e^{H0-H})
    rng: jax.Array


def _is_turning(p_left, p_right, psum, inverse_mass_matrix):
    v_left = p_left * inverse_mass_matrix
    v_right = p_right * inverse_mass_matrix
    return (jnp.dot(v_left, psum) <= 0.0) | (jnp.dot(v_right, psum) <= 0.0)


def build_kernel(logdensity_fn: Callable, max_depth: int = 10,
                 divergence_threshold: float = DIVERGENCE_THRESHOLD) -> Callable:
    """Return ``step(rng_key, state, step_size, inverse_mass_matrix)``."""

    def step(rng_key, state: NUTSState, step_size, inverse_mass_matrix):
        dim = state.position.shape[0]
        key_mom, key_tree = jax.random.split(rng_key)
        p0 = sample_momentum(key_mom, dim, inverse_mass_matrix)
        energy0 = -state.logdensity + euclidean_kinetic_energy(
            p0, inverse_mass_matrix)
        integrate = velocity_verlet(logdensity_fn, inverse_mass_matrix)

        z0 = EuclideanState(state.position, p0, state.logdensity,
                            state.logdensity_grad)

        def leaf_energy(z):
            return -z.logdensity + euclidean_kinetic_energy(
                z.momentum, inverse_mass_matrix)

        # ---------------------------------------------------- one subtree
        def build_subtree(rng, frontier: EuclideanState, direction,
                          depth) -> _SubtreeCarry:
            n_leaves = jnp.asarray(1, jnp.int32) << depth
            h = direction * step_size

            def cond(c: _SubtreeCarry):
                return (c.leaf < n_leaves + 1) & ~c.turning & ~c.diverging

            def body(c: _SubtreeCarry):
                z = integrate(c.z, h)
                energy = leaf_energy(z)
                delta = energy0 - energy
                delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
                diverging = -delta > divergence_threshold

                log_sum_w = jnp.logaddexp(c.log_sum_w, delta)
                rng, key_swap = jax.random.split(c.rng)
                take = jnp.log(
                    jax.random.uniform(key_swap)) < delta - log_sum_w
                prop_state = jax.tree.map(
                    lambda new, old: jnp.where(take, new, old), z,
                    c.prop_state)

                psum = c.psum + z.momentum
                n = c.leaf                       # 1-based leaf number
                is_odd = (n & 1) == 1

                # store checkpoint at odd leaves: slot = popcount(n-1)
                slot = _popcount(n - 1)
                ckpt_p = jnp.where(
                    is_odd, c.ckpt_p.at[slot].set(z.momentum), c.ckpt_p)
                ckpt_psum = jnp.where(
                    is_odd, c.ckpt_psum.at[slot].set(c.psum), c.ckpt_psum)

                # check complete subtrees ending at even leaves
                idx_max = _popcount(n - 1) - 1
                idx_min = idx_max - _trailing_zeros(jnp.maximum(n, 1)) + 1

                def check(i, turning):
                    p_left = ckpt_p[i]
                    sub_psum = psum - ckpt_psum[i]
                    return turning | _is_turning(
                        p_left, z.momentum, sub_psum, inverse_mass_matrix)

                turning = jax.lax.cond(
                    is_odd | diverging,
                    lambda: jnp.asarray(False),
                    lambda: jax.lax.fori_loop(
                        jnp.maximum(idx_min, 0), idx_max + 1, check,
                        jnp.asarray(False)))

                return _SubtreeCarry(
                    leaf=n + 1, z=z, prop_state=prop_state,
                    log_sum_w=log_sum_w, psum=psum,
                    ckpt_p=ckpt_p, ckpt_psum=ckpt_psum,
                    turning=turning, diverging=diverging,
                    sum_accept=c.sum_accept + jnp.minimum(1.0, jnp.exp(delta)),
                    rng=rng)

            init_carry = _SubtreeCarry(
                leaf=jnp.asarray(1, jnp.int32), z=frontier,
                prop_state=frontier,
                log_sum_w=jnp.asarray(-jnp.inf),
                psum=jnp.zeros(dim),
                ckpt_p=jnp.zeros((max_depth, dim)),
                ckpt_psum=jnp.zeros((max_depth, dim)),
                turning=jnp.asarray(False), diverging=jnp.asarray(False),
                sum_accept=jnp.asarray(0.0), rng=rng)
            return jax.lax.while_loop(cond, body, init_carry)

        # ------------------------------------------------- doubling loop
        class _TreeCarry(NamedTuple):
            left: EuclideanState
            right: EuclideanState
            prop_state: EuclideanState
            log_sum_w: jnp.ndarray
            psum: jnp.ndarray
            depth: jnp.ndarray
            turning: jnp.ndarray
            diverging: jnp.ndarray
            sum_accept: jnp.ndarray
            n_leaves: jnp.ndarray
            rng: jax.Array

        def cond(t: _TreeCarry):
            return (t.depth < max_depth) & ~t.turning & ~t.diverging

        def body(t: _TreeCarry):
            # four distinct keys: carry, direction, bias swap, subtree —
            # the subtree key must NOT be the carried key, or its internal
            # splits would collide with the next doubling's draws
            rng, key_dir, key_bias, key_sub = jax.random.split(t.rng, 4)
            go_right = jax.random.bernoulli(key_dir)
            direction = jnp.where(go_right, 1.0, -1.0)
            frontier = jax.tree.map(
                lambda r, l: jnp.where(go_right, r, l), t.right, t.left)

            sub = build_subtree(key_sub, frontier, direction, t.depth)
            sub_ok = ~sub.turning & ~sub.diverging

            # biased progressive sampling between tree and new subtree
            take = sub_ok & (
                jnp.log(jax.random.uniform(key_bias))
                < sub.log_sum_w - t.log_sum_w)
            prop_state = jax.tree.map(
                lambda new, old: jnp.where(take, new, old),
                sub.prop_state, t.prop_state)

            left = jax.tree.map(
                lambda l, z: jnp.where(go_right, l, z), t.left, sub.z)
            right = jax.tree.map(
                lambda r, z: jnp.where(go_right, z, r), t.right, sub.z)
            psum = t.psum + sub.psum
            turning_merged = _is_turning(
                left.momentum, right.momentum, psum, inverse_mass_matrix)

            return _TreeCarry(
                left=left, right=right, prop_state=prop_state,
                log_sum_w=jnp.logaddexp(t.log_sum_w, sub.log_sum_w),
                psum=psum, depth=t.depth + 1,
                turning=sub.turning | (sub_ok & turning_merged),
                diverging=sub.diverging,
                sum_accept=t.sum_accept + sub.sum_accept,
                n_leaves=t.n_leaves + (sub.leaf - 1),
                rng=rng)

        tree = _TreeCarry(
            left=z0, right=z0, prop_state=z0,
            log_sum_w=jnp.asarray(0.0),   # root leaf has weight e^0
            psum=p0, depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            sum_accept=jnp.asarray(0.0),
            n_leaves=jnp.asarray(1, jnp.int32),
            rng=key_tree)
        tree = jax.lax.while_loop(cond, body, tree)

        z = tree.prop_state
        new_state = NUTSState(z.position, z.logdensity, z.logdensity_grad)
        n_steps = tree.n_leaves - 1
        info = NUTSInfo(
            acceptance_rate=tree.sum_accept / jnp.maximum(n_steps, 1),
            is_divergent=tree.diverging,
            is_turning=tree.turning,
            energy=leaf_energy(z),
            num_integration_steps=n_steps,
            num_trajectory_expansions=tree.depth,
        )
        return new_state, info

    return step
