"""Pallas fused SGHMC kernel vs the reference tree update.

Deterministic (noise-off) semantics run under the TPU interpreter on CPU;
the PRNG path needs real TPU hardware (the interpreter stubs
prng_random_bits to zeros) and is validated there — see the noise-statistics
check in scripts and the TPU drive logs (std matches sqrt(2(1-m)lr)/n to
4 digits, KS-normality p>0.7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from benchmarks.pallas_sgmcmc import sghmc_update_flat

ON_TPU = jax.devices()[0].platform != "cpu"


@pytest.mark.parametrize("n", [1000, 8192])
def test_pallas_sghmc_matches_closed_form(n):
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=n), jnp.float32)
    v = jnp.asarray(rng.normal(size=n), jnp.float32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    lr, m, wd_n, ntr = 0.1, 0.9, 0.02, 100.0

    with pltpu.force_tpu_interpret_mode():
        # noise off: must match the closed form exactly
        p2, v2 = sghmc_update_flat(
            p, v, g, lr=lr, momentum=m, wd_over_n=wd_n, n_train=ntr,
            noise_on=0.0, is_first_step=0.0, seed=0,
        )
        p3, v3 = sghmc_update_flat(
            p, v, g, lr=lr, momentum=m, wd_over_n=wd_n, n_train=ntr,
            noise_on=0.0, is_first_step=1.0, seed=0,
        )
    d = np.asarray(g) + wd_n * np.asarray(p)
    v_ref = m * np.asarray(v) - lr * d
    np.testing.assert_allclose(np.asarray(v2), v_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p) + v_ref,
                               rtol=1e-5, atol=1e-6)
    v_ref3 = m * d - lr * d
    np.testing.assert_allclose(np.asarray(v3), v_ref3, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG needs a real TPU")
def test_pallas_sghmc_noise_statistics():
    n = 64 * 128 * 8
    z = jnp.zeros(n)
    lr, m, ntr = 0.1, 0.9, 100.0
    p2, _ = sghmc_update_flat(
        z, z, z, lr=lr, momentum=m, wd_over_n=0.0, n_train=ntr,
        noise_on=1.0, is_first_step=0.0, seed=7,
    )
    expected_std = np.sqrt(2 * (1 - m) * lr) / ntr
    a = np.asarray(p2)
    assert a.std() == pytest.approx(expected_std, rel=0.05)
    assert abs(a.mean()) < expected_std * 0.05
    tiles = a.reshape(8, -1)
    assert not np.allclose(tiles[0], tiles[1])


def test_pallas_int8_matvec_matches_reference():
    """The weight-streaming int8 matvec == the XLA int8-mxu computation
    (same per-tensor activation quant, per-row weight scales) exactly, and
    tracks the unquantized f32 matvec within quantization error."""
    from benchmarks.pallas_int8 import int8_matvec

    rng = np.random.default_rng(1)
    n, k = 512, 256
    w = jnp.asarray(rng.normal(size=(n, k)) / np.sqrt(k), jnp.float32)
    x = jnp.asarray(rng.normal(size=k), jnp.float32)

    amax = jnp.max(jnp.abs(w), axis=1)
    scales = jnp.maximum(amax, 1e-12) / 127.0
    w_q8 = jnp.clip(jnp.round(w / scales[:, None]), -127, 127).astype(jnp.int8)

    y = np.asarray(int8_matvec(w_q8, scales, x, tile_n=128, interpret=True))

    ax = jnp.max(jnp.abs(x))
    x_scale = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int32)
    ref = (np.asarray(w_q8, np.int64) @ np.asarray(xq, np.int64)).astype(
        np.float64) * np.asarray(scales, np.float64) * float(x_scale)
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)

    full = np.asarray(w, np.float64) @ np.asarray(x, np.float64)
    err = np.abs(y - full) / (np.abs(full).mean() + 1e-12)
    assert err.max() < 0.05  # int8 quantization error envelope
