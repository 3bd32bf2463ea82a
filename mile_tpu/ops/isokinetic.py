"""Pallas TPU kernels for the MCLMC hot path.

The MCLMC step interleaves model grads (MXU, left to XLA) with elementwise
state updates over the flat parameter vector (VPU). Two Pallas kernels
keep those updates in VMEM in a single pass each:

- :func:`fused_momentum_update` — the isokinetic velocity rotation
  (norms, rotation towards the preconditioned gradient, renormalization,
  kinetic-energy change) in one kernel: one read of (u, g), one write of
  u', no intermediate HBM round-trips.
- :func:`fused_refresh` — partial momentum refresh with the ON-CHIP TPU
  PRNG (``pltpu.prng_random_bits`` + Box-Muller) instead of host-keyed
  threefry: removes the per-step ``jax.random.normal`` tax, which is a
  real cost at small model sizes.

Both operate on a (dim,) vector padded to lane multiples; a mask keeps
the padding inert. Pure-JAX fallbacks (the reference-parity
implementations in :mod:`mile_tpu.mcmc.integrators`) are used on non-TPU
backends.

Under ``jax.vmap`` (the framework's multi-chain sampling path) custom
batching rules (``jax.custom_batching.custom_vmap``) reroute the whole
chain batch into ONE pallas_call with a grid over chains — one program
per chain, full padded vector per program in VMEM, Mosaic pipelining
the HBM block copies across grid steps. This removes the old
vmap-of-pallas_call pathology (per-chain serialized dispatch, 29×
slower than XLA at 4×1M).

MEASURED GUIDANCE (v5e, 2026-08, full MCLMC step on a quadratic
target, pallas/XLA step-time ratio): chain-batched pallas is ~parity:
0.98× at 10k×4, 0.87× at 10k×12 and 100k×12, 1.24× at 1M×4 (the
bandwidth-bound regime; fewer HBM passes + on-chip PRNG refresh).
Past ``_MAX_PADDED`` the batched rules fall back to identical
vectorized XLA math (scoped-VMEM safety). The kernels remain OPT-IN
(``integrator='mclachlan_pallas'``); default everywhere: the XLA
path, which additionally fuses across the surrounding scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap

LANE = 128
SUBLANE = 8
_TILE = LANE * SUBLANE
# Chain-batched kernels hold one chain's full (u, g, out) working set in
# VMEM; beyond this padded dim the scoped-VMEM budget (16 MiB default,
# incl. Mosaic multi-buffering — measured OOM at padded=1M with a
# 12-chain grid) can overflow, so fall back to vectorized XLA math.
# Raising vmem_limit_bytes instead was measured SLOWER (worse
# pipelining: 1M-dim 4 chains 633→812 us/step), so the default limit
# stays.
_MAX_PADDED = int(__import__('os').environ.get(
    'MILE_TPU_PALLAS_MAX_PADDED', 512 * 1024))


def pad_dim(dim: int) -> int:
    return ((dim + _TILE - 1) // _TILE) * _TILE


def on_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover
        return False


@functools.cache
def _momentum_kernel(padded: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = padded // LANE

    def kernel(u_ref, g_ref, scale_ref, out_u_ref, out_dk_ref):
        # scale_ref: (1,1) SMEM = step_size (already multiplied by any
        # integrator coefficient); g_ref is pre-multiplied by the
        # preconditioner outside (fused by XLA into the grad epilogue).
        u = u_ref[:]
        g = g_ref[:]
        dim_m1 = scale_ref[0, 1]
        g_norm = jnp.sqrt(jnp.sum(g * g))
        e = g / jnp.maximum(g_norm, 1e-30)
        ue = jnp.sum(u * e)
        delta = scale_ref[0, 0] * g_norm / dim_m1
        zeta = jnp.exp(-delta)
        new_u = e * ((1.0 - zeta) * (1.0 + zeta + ue * (1.0 - zeta))) \
            + 2.0 * zeta * u
        inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(new_u * new_u), 1e-30))
        out_u_ref[:] = new_u * inv_norm
        delta_r = delta - jnp.log(2.0) + jnp.log1p(
            ue + (1.0 - ue) * zeta * zeta)
        out_dk_ref[0, 0] = delta_r * dim_m1

    @jax.jit
    def run(u2d, g2d, scale):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )(u2d, g2d, scale)

    return run, rows


@functools.cache
def _batched_momentum_kernel(n_chains: int, padded: int):
    """Chain-batched variant: ONE pallas_call, grid over chains. Each
    program owns one chain's full padded vector in VMEM (fits for
    dim ≲ 1.3M fp32 under the ~16 MB VMEM budget); Mosaic pipelines the
    HBM↔VMEM block copies across grid steps, so the launch is
    bandwidth-bound instead of dispatch-bound like vmap-of-pallas_call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = padded // LANE

    def kernel(u_ref, g_ref, scale_ref, out_u_ref, out_dk_ref):
        # SMEM blocks hold the FULL (C, ...) arrays (Mosaic requires SMEM
        # block dims == array dims); index by the chain program id.
        c = pl.program_id(0)
        u = u_ref[0]
        g = g_ref[0]
        dim_m1 = scale_ref[c, 1]
        g_norm = jnp.sqrt(jnp.sum(g * g))
        e = g / jnp.maximum(g_norm, 1e-30)
        ue = jnp.sum(u * e)
        delta = scale_ref[c, 0] * g_norm / dim_m1
        zeta = jnp.exp(-delta)
        new_u = e * ((1.0 - zeta) * (1.0 + zeta + ue * (1.0 - zeta))) \
            + 2.0 * zeta * u
        inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(new_u * new_u), 1e-30))
        out_u_ref[0] = new_u * inv_norm
        delta_r = delta - jnp.log(2.0) + jnp.log1p(
            ue + (1.0 - ue) * zeta * zeta)
        out_dk_ref[c, 0] = delta_r * dim_m1

    @jax.jit
    def run(u3, g3, scale):
        return pl.pallas_call(
            kernel,
            grid=(n_chains,),
            out_shape=(
                jax.ShapeDtypeStruct((n_chains, rows, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec((1, rows, LANE), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, LANE), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_chains, 2), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, rows, LANE), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_chains, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        )(u3, g3, scale)

    return run, rows


def _momentum_update_xla(momentum, g_scaled, step_size):
    """Vectorized fallback (same math, XLA-fused) for dims whose full
    per-chain vector exceeds the VMEM budget of the grid kernel."""
    dim = momentum.shape[1]
    g_norm = jnp.sqrt(jnp.sum(g_scaled * g_scaled, axis=1, keepdims=True))
    e = g_scaled / jnp.maximum(g_norm, 1e-30)
    ue = jnp.sum(momentum * e, axis=1, keepdims=True)
    delta = step_size[:, None] * g_norm / (dim - 1)
    zeta = jnp.exp(-delta)
    new_u = e * ((1.0 - zeta) * (1.0 + zeta + ue * (1.0 - zeta))) \
        + 2.0 * zeta * momentum
    norm = jnp.sqrt(jnp.sum(new_u * new_u, axis=1, keepdims=True))
    new_u = new_u / jnp.maximum(norm, 1e-30)
    delta_r = delta - jnp.log(2.0) + jnp.log1p(ue + (1.0 - ue) * zeta * zeta)
    return new_u, (delta_r * (dim - 1))[:, 0]


def _momentum_update_batched(momentum, g_scaled, step_size):
    """(C, dim) chain batch through the grid kernel. ``g_scaled`` is the
    gradient pre-multiplied by the preconditioner; ``step_size`` (C,)."""
    n_chains, dim = momentum.shape
    padded = pad_dim(dim)
    if padded > _MAX_PADDED:
        import logging

        logging.getLogger(__name__).info(
            'pallas momentum kernel: padded dim %d > cap %d, using XLA '
            'math (override via MILE_TPU_PALLAS_MAX_PADDED)', padded,
            _MAX_PADDED)
        return _momentum_update_xla(momentum, g_scaled, step_size)
    run, rows = _batched_momentum_kernel(n_chains, padded)
    pad = ((0, 0), (0, padded - dim))
    u3 = jnp.pad(momentum, pad).reshape(n_chains, rows, LANE)
    g3 = jnp.pad(g_scaled, pad).reshape(n_chains, rows, LANE)
    scale = jnp.stack(
        [step_size.astype(jnp.float32),
         jnp.full((n_chains,), dim - 1, jnp.float32)], axis=1)
    new_u, dk = run(u3, g3, scale)
    return new_u.reshape(n_chains, -1)[:, :dim], dk[:, 0]


@custom_vmap
def fused_momentum_update(momentum: jnp.ndarray, gradient: jnp.ndarray,
                          step_size: jnp.ndarray,
                          sqrt_diag_cov: jnp.ndarray | float
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas version of
    :func:`mile_tpu.mcmc.integrators.isokinetic_momentum_update`.

    The (dim,) inputs are zero-padded to a lane-aligned 2D tile; zero
    padding is exact for every reduction involved (sums of squares/dots).
    Under ``jax.vmap`` a custom batching rule reroutes the whole chain
    batch into ONE grid-over-chains pallas_call.
    """
    dim = momentum.shape[0]
    padded = pad_dim(dim)
    run, rows = _momentum_kernel(padded)
    g = gradient * sqrt_diag_cov
    u2d = jnp.pad(momentum, (0, padded - dim)).reshape(rows, LANE)
    g2d = jnp.pad(g, (0, padded - dim)).reshape(rows, LANE)
    scale = jnp.stack([step_size.astype(jnp.float32),
                       jnp.float32(dim - 1)]).reshape(1, 2)
    new_u, dk = run(u2d, g2d, scale)
    return new_u.reshape(-1)[:dim], dk[0, 0]


@fused_momentum_update.def_vmap
def _fused_momentum_update_vmap(axis_size, in_batched, momentum, gradient,
                                step_size, sqrt_diag_cov):
    u_b, g_b, s_b, c_b = in_batched
    if not u_b:
        momentum = jnp.broadcast_to(momentum, (axis_size, *momentum.shape))
    if not g_b:
        gradient = jnp.broadcast_to(gradient, (axis_size, *gradient.shape))
    sdc = jnp.asarray(sqrt_diag_cov, jnp.float32)
    if c_b and sdc.ndim == 1:   # per-chain scalar preconditioner
        sdc = sdc[:, None]
    g_scaled = gradient * sdc   # unbatched () or (dim,) broadcasts directly
    step_size = jnp.asarray(step_size, jnp.float32)
    if not s_b:
        step_size = jnp.broadcast_to(step_size, (axis_size,))
    new_u, dk = _momentum_update_batched(momentum, g_scaled, step_size)
    return (new_u, dk), (True, True)


@functools.cache
def _refresh_kernel(padded: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = padded // LANE
    TWO_PI = 6.283185307179586

    def kernel(u_ref, par_ref, seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        # Box-Muller from on-chip random bits -> standard normals.
        # Raw bits are reinterpreted unsigned and truncated to 24 bits so
        # the uniform conversion is exact in fp32 (and strictly positive
        # for the log).
        shape = (rows, LANE)
        def uniform_bits():
            raw = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            # logical shift to 24 bits, then through int32 for the f32
            # cast (Mosaic has no uint32->float32 cast)
            return pltpu.bitcast(raw >> 8, jnp.int32).astype(jnp.float32)

        ua = (uniform_bits() + 1.0) * (1.0 / 16777216.0)  # (0, 1]
        ub = uniform_bits() * (1.0 / 16777216.0)          # [0, 1)
        z = jnp.sqrt(-2.0 * jnp.log(ua)) * jnp.cos(TWO_PI * ub)
        nu = par_ref[0, 0]
        # padding lanes of u are exactly 0; zero their noise so the norm
        # reduction stays exact:
        z = jnp.where(u_ref[:] == 0.0, 0.0, z)
        new_u = u_ref[:] + nu * z
        inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(new_u * new_u), 1e-30))
        out_ref[:] = new_u * inv_norm

    @jax.jit
    def run(u2d, par, seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(u2d, par, seed)

    return run, rows


@functools.cache
def _batched_refresh_kernel(n_chains: int, padded: int):
    """Grid-over-chains refresh: one program per chain, per-chain seed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = padded // LANE
    TWO_PI = 6.283185307179586

    def kernel(u_ref, par_ref, seed_ref, out_ref):
        c = pl.program_id(0)
        pltpu.prng_seed(seed_ref[c, 0])
        shape = (rows, LANE)

        def uniform_bits():
            raw = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            return pltpu.bitcast(raw >> 8, jnp.int32).astype(jnp.float32)

        ua = (uniform_bits() + 1.0) * (1.0 / 16777216.0)
        ub = uniform_bits() * (1.0 / 16777216.0)
        z = jnp.sqrt(-2.0 * jnp.log(ua)) * jnp.cos(TWO_PI * ub)
        u = u_ref[0]
        z = jnp.where(u == 0.0, 0.0, z)
        new_u = u + par_ref[c, 0] * z
        inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(new_u * new_u), 1e-30))
        out_ref[0] = new_u * inv_norm

    @jax.jit
    def run(u3, par, seeds):
        return pl.pallas_call(
            kernel,
            grid=(n_chains,),
            out_shape=jax.ShapeDtypeStruct((n_chains, rows, LANE),
                                           jnp.float32),
            in_specs=[
                pl.BlockSpec((1, rows, LANE), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_chains, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_chains, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, LANE), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(u3, par, seeds)

    return run, rows


@custom_vmap
def fused_refresh(momentum: jnp.ndarray, seed: jnp.ndarray,
                  step_size: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Partial momentum refresh with on-chip PRNG.

    NOTE: exact zero entries of ``momentum`` receive no noise (used to
    keep padding inert). True zeros in a live unit vector have measure
    zero, so this does not affect the dynamics. Under ``jax.vmap`` a
    custom batching rule reroutes the chain batch into ONE
    grid-over-chains pallas_call with per-chain seeds.
    """
    dim = momentum.shape[0]
    padded = pad_dim(dim)
    run, rows = _refresh_kernel(padded)
    nu = jnp.sqrt((jnp.exp(2.0 * step_size / L) - 1.0) / dim)
    u2d = jnp.pad(momentum, (0, padded - dim)).reshape(rows, LANE)
    out = run(u2d, nu.astype(jnp.float32).reshape(1, 1),
              seed.astype(jnp.int32).reshape(1))
    return out.reshape(-1)[:dim]


@fused_refresh.def_vmap
def _fused_refresh_vmap(axis_size, in_batched, momentum, seed, step_size, L):
    u_b, seed_b, s_b, l_b = in_batched
    if not u_b:
        momentum = jnp.broadcast_to(momentum, (axis_size, *momentum.shape))
    n_chains, dim = momentum.shape
    seed = jnp.asarray(seed, jnp.int32)
    if not seed_b:
        # chains must not share a noise stream: derive distinct seeds
        seed = seed + jnp.arange(axis_size, dtype=jnp.int32)
    step_size = jnp.asarray(step_size, jnp.float32)
    if not s_b:
        step_size = jnp.broadcast_to(step_size, (axis_size,))
    L = jnp.asarray(L, jnp.float32)
    if not l_b:
        L = jnp.broadcast_to(L, (axis_size,))
    padded = pad_dim(dim)
    nu = jnp.sqrt((jnp.exp(2.0 * step_size / L) - 1.0) / dim)
    if padded > _MAX_PADDED:  # VMEM-budget fallback: threefry normals
        keys = jax.vmap(lambda s: jax.random.key(s.astype(jnp.uint32)))(seed)
        z = jax.vmap(lambda k: jax.random.normal(k, (dim,)))(keys)
        u = momentum + nu[:, None] * z
        norm = jnp.sqrt(jnp.sum(u * u, axis=1, keepdims=True))
        return u / jnp.maximum(norm, 1e-30), True
    run, rows = _batched_refresh_kernel(n_chains, padded)
    u3 = jnp.pad(momentum, ((0, 0), (0, padded - dim))).reshape(
        n_chains, rows, LANE)
    out = run(u3, nu.astype(jnp.float32).reshape(n_chains, 1),
              seed.reshape(n_chains, 1))
    return out.reshape(n_chains, -1)[:, :dim], True
