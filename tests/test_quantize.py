"""Weight-only int8 quantization + engine parity (profiling/quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ursabench_tpu import models
from ursabench_tpu.inference.engine import init_variables
from ursabench_tpu.profiling.latency import build_engine
from ursabench_tpu.profiling.quantize import (
    dequantize_tree,
    quantization_error,
    quantize_tree,
)
from ursabench_tpu.util import tree_stack


def test_quantize_roundtrip_exact_on_grid():
    """Values already on the symmetric 127-level grid reconstruct exactly."""
    scale = jnp.asarray([0.5, 0.25])
    w = (jnp.arange(-127, 127, dtype=jnp.float32)[:, None]
         * scale[None, :])  # (254, 2): per-out-channel grids
    q = quantize_tree({"k": w})
    out = dequantize_tree(q, jnp.float32)["k"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(w), rtol=0, atol=0)
    assert q["k"]["q8"].dtype == jnp.int8
    assert q["k"]["scale"].shape == (1, 2)


def test_quantization_error_small_on_model_params():
    module = models.get_model("MLP200MNIST").build(10)
    params = init_variables(module, jax.random.PRNGKey(0), (28, 28, 1))["params"]
    err = quantization_error(params)
    assert err < 0.015, err  # ~0.5% rms for a 127-level symmetric grid


def test_member_axis_scales_are_per_member():
    w = jnp.stack([jnp.ones((3, 3, 4, 8)), 10.0 * jnp.ones((3, 3, 4, 8))])
    q = quantize_tree({"kernel": w}, member_axis=True)
    s = np.asarray(q["kernel"]["scale"])
    assert s.shape == (2, 1, 1, 1, 8)
    assert np.allclose(s[1], 10 * s[0])
    # biases (S, C) pass through untouched
    qb = quantize_tree({"bias": jnp.ones((2, 8))}, member_axis=True)
    assert "raw" in qb["bias"]


def test_int8_engine_matches_fp32_probs():
    module = models.get_model("MLP200MNIST").build(10)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    variables = [init_variables(module, k, (28, 28, 1)) for k in keys]
    params = tree_stack([v["params"] for v in variables])
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 28, 28, 1))

    ref, _ = build_engine(module, params, None, 4, (28, 28, 1), "fp32")
    q, _ = build_engine(module, params, None, 4, (28, 28, 1), "int8")
    p_ref = np.asarray(ref(x))
    p_q = np.asarray(q(x))
    assert p_q.shape == p_ref.shape
    np.testing.assert_allclose(p_q, p_ref, atol=0.03)
    assert np.allclose(p_q.sum(-1), 1.0, atol=1e-3)
