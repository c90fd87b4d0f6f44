"""Hardware peak numbers + XLA cost analysis for honest MFU reporting.

The reference's profiling layer reports wall-clock only
(/root/reference/URSABench/trtprof/prof.py:153-171). Fraction-of-peak is the
demanding TPU metric: achieved FLOP/s comes from XLA's own cost model
(compiled.cost_analysis()) divided by the device's published peak.
"""

from __future__ import annotations

from typing import Optional

# device_kind substring -> (bf16 peak FLOP/s, HBM bytes/s) per public specs
_PEAKS = {
    "v5 lite": (197e12, 819e9),  # v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6 lite": (918e12, 1640e9),  # v6e / Trillium
    "v6e": (918e12, 1640e9),
    "v4": (275e12, 1228e9),
    "v3": (123e12, 900e9),
    "v2": (45e12, 700e9),
}


def device_peaks(device=None) -> tuple[Optional[float], Optional[float]]:
    """(bf16 peak FLOP/s, HBM bytes/s) for the given (default: first) device;
    (None, None) when the device kind isn't in the table."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", str(device)).lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return None, None


def xla_cost(jitfn, *args) -> dict:
    """{'flops': float|None, 'bytes': float|None} from the compiled program's
    cost analysis (a second AOT compile, served by the compilation cache)."""
    try:
        ca = jitfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca["flops"]) if "flops" in ca else None,
            "bytes": float(ca["bytes accessed"]) if "bytes accessed" in ca else None,
        }
    except Exception:
        return {"flops": None, "bytes": None}


def train_step_cost(module, spec_shape, batch_size: int) -> dict:
    """XLA cost of one fwd+bwd training batch as a FLAT jitted program.

    NOTE: cost_analysis on a scanned epoch program counts the loop body
    once (trip count is not multiplied in), so per-step cost must come from
    an unrolled single-step program like this one. The sampler's elementwise
    update and the augmentation einsums are <1% of conv flops and excluded.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..inference.engine import init_variables

    v = init_variables(module, jax.random.PRNGKey(0), spec_shape)
    params = v["params"]
    bstats = v.get("batch_stats", {})
    x = jnp.zeros((batch_size,) + tuple(spec_shape), jnp.float32)
    y = jnp.zeros((batch_size,), jnp.int32)

    def loss_fn(p, b, x, y):
        variables = {"params": p}
        if b:
            variables["batch_stats"] = b
        logits, mut = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.mean(), mut.get("batch_stats", {})

    g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    return xla_cost(g, params, bstats, x, y)


def mfu(achieved_flops_per_sec: Optional[float], device=None) -> Optional[float]:
    peak, _ = device_peaks(device)
    if peak is None or achieved_flops_per_sec is None:
        return None
    return achieved_flops_per_sec / peak
