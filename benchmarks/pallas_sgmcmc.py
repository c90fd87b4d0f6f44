"""Pallas TPU kernel: fused SGHMC update with on-chip Langevin noise.

PROBE STATUS (r4): lives in benchmarks/, not the package — the
production SGHMC path (ops/sgmcmc.py) is already fused by XLA into
the epoch program; this kernel is the measured alternative kept as
evidence (noise-std and KS-normality verified on TPU hardware).

The SGHMC step (ops/sgmcmc.py, mirroring optim_sghmc.py:43-67) is
bandwidth-bound: read (p, v, g), write (p, v), plus Gaussian noise. XLA
fuses the arithmetic but generates the noise through a separate threefry
program with its own HBM round-trip. This kernel does the whole update in
one VMEM pass per tile using the TPU's native PRNG
(`pltpu.prng_random_bits`) and a Box-Muller transform — one read per
operand, one write per output, noise never touches HBM.

Layout: the flat parameter vector is processed in (8, 128)-aligned tiles
with a 1-D grid; each grid step reseeds the per-core PRNG from
(seed, program_id) so tiles draw independent streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
TILE_ROWS = 64  # (64, 128) f32 tile = 32 KiB/operand; 5 operands << VMEM


def _uniform_from_bits(shape):
    """U[0,1) via the mantissa-bitcast trick: set exponent to 127, fill the
    23-bit mantissa with random bits -> float in [1,2), subtract 1. Avoids
    any signed-int conversion pitfalls."""
    bits = pltpu.prng_random_bits(shape)
    mantissa = jnp.bitwise_and(bits, jnp.int32(0x007FFFFF))
    one_to_two = pltpu.bitcast(
        jnp.bitwise_or(mantissa, jnp.int32(0x3F800000)), jnp.float32
    )
    return one_to_two - 1.0


def _normal_from_bits(shape):
    """Standard normals via Box-Muller on raw PRNG bits."""
    u1 = jnp.maximum(_uniform_from_bits(shape), 1e-12)
    u2 = _uniform_from_bits(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _sghmc_kernel(scalar_ref, seed_ref, p_ref, v_ref, g_ref, p_out, v_out):
    lr = scalar_ref[0]
    momentum = scalar_ref[1]
    wd_over_n = scalar_ref[2]
    noise_scale = scalar_ref[3]  # sqrt(2*(1-m)*lr)/n * noise_on
    is_first = scalar_ref[4]

    # two-component seed: (step seed, tile id). A single additive seed would
    # overlap streams across consecutive steps (step s tile i == step s+1
    # tile i-1), correlating Langevin noise between SGHMC steps.
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    p = p_ref[:]
    g = g_ref[:]
    d = g + wd_over_n * p
    v_prev = jnp.where(is_first > 0.5, d, v_ref[:])
    v_new = momentum * v_prev - lr * d
    v_new = v_new + noise_scale * _normal_from_bits(p.shape)
    p_out[:] = p + v_new
    v_out[:] = v_new


def sghmc_update_flat(
    params: jnp.ndarray,
    momentum_buf: jnp.ndarray,
    grads: jnp.ndarray,
    *,
    lr,
    momentum,
    wd_over_n,
    n_train,
    noise_on,
    is_first_step,
    seed,
    interpret: bool = False,
):
    """Fused SGHMC step on a flat f32 vector. Returns (params, momentum).

    Semantics identical to ops.sgmcmc.sghmc_update on a single flat leaf
    (verified in tests/test_pallas.py); the Gaussian stream differs (TPU
    hardware PRNG instead of threefry), which is within the framework's
    statistical-parity contract (BASELINE.md).
    """
    n = params.shape[0]
    tile = TILE_ROWS * LANE
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(n_pad // LANE, LANE)

    p2, v2, g2 = prep(params), prep(momentum_buf), prep(grads)
    rows = n_pad // LANE
    grid = rows // TILE_ROWS

    noise_scale = (
        jnp.sqrt(2.0 * (1.0 - momentum) * lr) / n_train
    ) * noise_on
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(momentum, jnp.float32),
        jnp.asarray(wd_over_n, jnp.float32),
        jnp.asarray(noise_scale, jnp.float32),
        jnp.asarray(is_first_step, jnp.float32),
    ])
    seed_arr = jnp.asarray([seed], jnp.int32)

    block = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_p, out_v = pl.pallas_call(
        _sghmc_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, block, block,
        ],
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ),
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(scalars, seed_arr, p2, v2, g2)
    return out_p.reshape(-1)[:n], out_v.reshape(-1)[:n]
