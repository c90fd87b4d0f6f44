"""Serialized inference engines — the to_onnx.py / trtexec analogue.

The reference exports models to ONNX and builds TensorRT engine files
(trtprof/to_onnx.py:28-84, batch_onnx2trt.sh). The XLA-native equivalent is
``jax.export``: the vmapped BMA ensemble forward (weights baked in, fixed
batch, fp32 or bf16 compute) serializes to a portable StableHLO artifact
that any later process deserializes and executes without the Python model
code — the same deploy-an-engine workflow, minus the format zoo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..util import softmax_probs


def export_bma_engine(
    module, params, batch_stats, batch_size: int, input_shape,
    precision: str = "fp32",
) -> bytes:
    """Serialize the fixed-shape BMA forward (x -> mean member probs) with
    the ensemble weights embedded as constants (like a built engine)."""
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        t,
    )
    params = cast(params)
    if batch_stats is not None:
        batch_stats = cast(batch_stats)

    def fn(x):
        def one(p, b):
            variables = {"params": p}
            if b is not None:
                variables["batch_stats"] = b
            return module.apply(variables, x.astype(dtype), train=False)

        bs_axis = None if batch_stats is None else 0
        logits = jax.vmap(one, in_axes=(0, bs_axis))(params, batch_stats)
        return softmax_probs(logits.astype(jnp.float32)).mean(axis=0)

    x_spec = jax.ShapeDtypeStruct((batch_size,) + tuple(input_shape), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(x_spec)
    return exported.serialize()


def save_engine(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_engine(path: str):
    """Deserialize an engine file; returns a callable(x) -> probs."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return lambda x: exported.call(x)
