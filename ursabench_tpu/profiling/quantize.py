"""Post-training weight quantization for inference engines.

The reference's TensorRT pipeline builds fp16 and fp32 engines
(/root/reference/URSABench/trtprof/batch_onnx2trt.sh — trtexec's --fp16
split); trtexec also offers --int8 engines, which the reference never
exercised. This module supplies the TPU-native analogue: symmetric
per-output-channel int8 weight quantization. The engine stores kernels as
int8 (+ a small scale tensor) and dequantizes to the compute dtype inside
the jitted forward — XLA fuses the dequant into each kernel's consumer, so
HBM weight traffic drops 4x vs fp32 (2x vs bf16). That is exactly the
regime the latency protocol measures at batch 1, where ensemble forwards
are weight-streaming bound.

Scheme: for each floating kernel leaf with ndim >= min_ndim, the scale is
max|w| / 127 reduced over every axis except the output-channel (last) axis
— and except the leading stacked-member axis for ensembles — so each output
channel of each member quantizes independently (the TensorRT per-channel
convention). Biases, BN parameters, and other small 1D leaves pass through
in the compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_tree", "dequantize_tree", "quantization_error"]


def _is_encoded(node) -> bool:
    return isinstance(node, dict) and ("q8" in node or "raw" in node)


def quantize_tree(params, *, member_axis: bool = False, min_ndim: int = 2):
    """Encode a params pytree: quantizable kernels -> {'q8', 'scale'},
    everything else -> {'raw'}. ``member_axis=True`` treats axis 0 as a
    stacked-ensemble axis (per-member scales)."""

    def enc(x):
        x = jnp.asarray(x)
        if (not jnp.issubdtype(x.dtype, jnp.floating)
                or x.ndim < min_ndim + (1 if member_axis else 0)):
            return {"raw": x}
        lo = 1 if member_axis else 0
        red_axes = tuple(range(lo, x.ndim - 1))
        if not red_axes:
            return {"raw": x}
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=red_axes, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return {"q8": q, "scale": scale.astype(jnp.float32)}

    return jax.tree.map(enc, params)


def dequantize_tree(qtree, dtype=jnp.bfloat16):
    """Decode back to a dense pytree in ``dtype`` (int/bool raws keep their
    own dtype). Called inside the jitted engine so the dense weights are a
    fusion temporary, never an HBM-resident copy."""

    def dec(node):
        if "raw" in node:
            x = node["raw"]
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
                return jnp.asarray(x).astype(dtype)
            return x
        return node["q8"].astype(dtype) * node["scale"].astype(dtype)

    return jax.tree.map(dec, qtree, is_leaf=_is_encoded)


def quantization_error(params, *, member_axis: bool = False) -> float:
    """Max relative L2 error over quantized leaves (sanity metric; the
    127-level symmetric grid sits around ~0.5% rms)."""
    q = quantize_tree(params, member_axis=member_axis)
    d = dequantize_tree(q, jnp.float32)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(d)):
        a = jnp.asarray(a, jnp.float32)
        denom = float(jnp.linalg.norm(a.reshape(-1))) or 1.0
        err = float(jnp.linalg.norm((a - b).reshape(-1))) / denom
        worst = max(worst, err)
    return worst
