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

MEASURED GUIDANCE (v5e, 2026-08): these kernels are OPT-IN
(``integrator='mclachlan_pallas'``) and only pay off single-chain at
very large dims — un-vmapped, dim=1M: pallas 0.38 ms/step vs XLA
0.47 ms/step (+21%). Under ``vmap`` (the framework's multi-chain
sampling path) XLA wins decisively at every size tested (29× at 4×1M:
vmap runs the pallas_call per-chain while XLA fuses the whole chain
batch, which can stay VMEM-resident across scan steps). Default
everywhere: the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128
SUBLANE = 8
_TILE = LANE * SUBLANE


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


def fused_momentum_update(momentum: jnp.ndarray, gradient: jnp.ndarray,
                          step_size: jnp.ndarray,
                          sqrt_diag_cov: jnp.ndarray | float
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas version of
    :func:`mile_tpu.mcmc.integrators.isokinetic_momentum_update`.

    The (dim,) inputs are zero-padded to a lane-aligned 2D tile; zero
    padding is exact for every reduction involved (sums of squares/dots).
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


def fused_refresh(momentum: jnp.ndarray, seed: jnp.ndarray,
                  step_size: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Partial momentum refresh with on-chip PRNG.

    NOTE: exact zero entries of ``momentum`` receive no noise (used to
    keep padding inert). True zeros in a live unit vector have measure
    zero, so this does not affect the dynamics.
    """
    dim = momentum.shape[0]
    padded = pad_dim(dim)
    run, rows = _refresh_kernel(padded)
    nu = jnp.sqrt((jnp.exp(2.0 * step_size / L) - 1.0) / dim)
    u2d = jnp.pad(momentum, (0, padded - dim)).reshape(rows, LANE)
    out = run(u2d, nu.astype(jnp.float32).reshape(1, 1),
              seed.astype(jnp.int32).reshape(1))
    return out.reshape(-1)[:dim]
