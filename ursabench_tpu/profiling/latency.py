"""Ensemble latency profiling — the TPU-native trtprof replacement.

The reference subsystem (/root/reference/URSABench/trtprof/) converts models
to TensorRT engines and times pagelocked HtoD -> execute -> DtoH rounds on a
CUDA stream (prof.py:36-80). Here "building an engine" is AOT-compiling the
vmapped ensemble forward with ``jax.jit(...).lower(...).compile()`` for an
fp32 or bf16 compute dtype (the fp32/fp16 TRT engine split, batch_onnx2trt),
and the measurement protocol is carried over exactly: 30 warm-up iterations
(prof.py:141-150), 10 timed reps per batch (prof.py:153-171), 10-batch
burn-in in the aggregate (run_prediction.py:70-78). Results land in a JSON
cache keyed by configuration so interrupted sweeps resume
(run_prediction.py:127-141), and make_table renders the LaTeX comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from dataclasses import asdict, dataclass

import jax
import jax.numpy as jnp
import numpy as np

WARM_UP_ITERS = 30  # prof.py:141-150
REPS_PER_BATCH = 10  # prof.py:153-171
BURN_IN_BATCHES = 10  # run_prediction.py:70


@dataclass(frozen=True)
class ProfileConfig:
    model: str
    dataset: str
    precision: str  # 'fp32' | 'bf16' | 'int8' (weight-only, see quantize.py)
    ensemble_size: int
    batch_size: int

    def key(self) -> str:
        return (f"{self.model}.{self.dataset}.{self.precision}"
                f".ensemble{self.ensemble_size}.bs{self.batch_size}")


def build_engine(module, params, batch_stats, batch_size, input_shape,
                 precision="fp32"):
    """AOT-compile the vmapped BMA forward — the 'TensorRT engine build'.

    Returns (compiled_fn, example_input). bf16 casts params + activations
    (fp32 accumulation on the MXU via preferred_element_type default).
    'int8' stores kernels as symmetric per-output-channel int8 and
    dequantizes to bf16 inside the engine (trtexec --int8 analogue;
    weights occupy 4x less HBM, the batch-1 bound) — see quantize.py.
    """
    dtype = jnp.bfloat16 if precision in ("bf16", "int8") else jnp.float32
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )
    if precision == "int8":
        from .quantize import dequantize_tree, quantize_tree

        params = quantize_tree(params, member_axis=True)
        decode = lambda p: dequantize_tree(p, dtype)
    else:
        params = cast(params)
        decode = lambda p: p
    if batch_stats is not None:
        batch_stats = cast(batch_stats)

    def fn(params, batch_stats, x):
        def one(p, b):
            variables = {"params": decode(p)}  # per-member: dequant fuses
            if b is not None:
                variables["batch_stats"] = b
            return module.apply(variables, x.astype(dtype), train=False)

        bs_axis = None if batch_stats is None else 0
        logits = jax.vmap(one, in_axes=(0, bs_axis))(params, batch_stats)
        # posterior-mean probabilities (consistent with export.py engines)
        return jnp.exp(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ).mean(0)

    x = jnp.zeros((batch_size,) + tuple(input_shape), jnp.float32)
    compiled = jax.jit(fn).lower(params, batch_stats, x).compile()
    engine = lambda xb: compiled(params, batch_stats, xb)
    try:  # XLA's own flops count -> achieved TFLOP/s + MFU in the results
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        engine.cost_flops = float(ca["flops"]) if "flops" in ca else None
    except Exception:
        engine.cost_flops = None
    return engine, x


def time_engine(engine, x, num_batches=20):
    """warm_up + per-batch timed reps; returns (lat_mean, lat_std) seconds
    over post-burn-in batches.

    Each rep ends with a device->host fetch of the result. That is (a)
    protocol-faithful — the TensorRT reference times HtoD + execute + DtoH
    per call (prof.py:72-80) — and (b) REQUIRED for correctness on remote
    device tunnels where block_until_ready returns before the execution
    finishes (measured: block-only timings collapse to the ~0.1 ms RPC
    round-trip regardless of model size)."""
    for _ in range(WARM_UP_ITERS):
        np.asarray(engine(x))
    lats = []
    for b in range(num_batches):
        t0 = time.perf_counter()
        for _ in range(REPS_PER_BATCH):
            out = np.asarray(engine(x))
        del out
        lats.append((time.perf_counter() - t0) / REPS_PER_BATCH)
    lats = np.asarray(lats[BURN_IN_BATCHES:] if len(lats) > BURN_IN_BATCHES else lats)
    return float(lats.mean()), float(lats.std())


def profile_config(cfg: ProfileConfig, trace_dir: str | None = None) -> dict:
    from .. import models
    from ..inference.engine import init_variables
    from ..util import tree_stack

    mcfg = models.get_model(cfg.model)
    module = mcfg.build(100 if cfg.dataset == "CIFAR100" else 10)
    spec = mcfg.transform_test
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.ensemble_size)
    variables = [init_variables(module, k, spec.shape) for k in keys]
    params = tree_stack([v["params"] for v in variables])
    bstats = None
    if variables[0].get("batch_stats"):
        bstats = tree_stack([v["batch_stats"] for v in variables])

    engine, x = build_engine(
        module, params, bstats, cfg.batch_size, spec.shape, cfg.precision
    )
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            mean, std = time_engine(engine, x)
    else:
        mean, std = time_engine(engine, x)
    out = {
        **asdict(cfg),
        "latency_mean_s": mean,
        "latency_std_s": std,
        "images_per_sec": cfg.batch_size / mean,
        "device": str(jax.devices()[0]),
    }
    flops = getattr(engine, "cost_flops", None)
    if flops:
        from .hw import device_peaks

        achieved = flops / mean
        out["achieved_tflops"] = round(achieved / 1e12, 2)
        peak, _ = device_peaks()
        if peak:
            out["mfu_pct"] = round(achieved / peak * 100, 1)
    return out


def profile_prediction(cfg: ProfileConfig, splits, num_classes: int,
                       sampler=None) -> dict:
    """Combined metrics + latency profiling — the run_prediction.py
    equivalent (trtprof/run_prediction.py:197-243): run the Prediction task
    in latency_mode over a real test split with a sampled (or
    randomly-initialized) ensemble, aggregate per-batch latency with the
    10-batch burn-in (get_latency, run_prediction.py:70-78)."""
    from .. import models, tasks
    from ..inference.engine import init_variables
    from ..inference.ensemble import Ensemble
    from ..util import tree_stack

    mcfg = models.get_model(cfg.model)
    module = mcfg.build(num_classes)
    if sampler is not None:
        ensemble = sampler.sample(num_samples=cfg.ensemble_size)
    else:
        keys = jax.random.split(jax.random.PRNGKey(0), cfg.ensemble_size)
        variables = [
            init_variables(module, k, mcfg.transform_test.shape) for k in keys
        ]
        params = tree_stack([v["params"] for v in variables])
        bstats = None
        if variables[0].get("batch_stats"):
            bstats = tree_stack([v["batch_stats"] for v in variables])
        ensemble = Ensemble(module, params, bstats, cfg.ensemble_size)

    task = tasks.Prediction(
        {"in_distribution_test": splits["test"]}, num_classes,
        metric_list="ALL", latency_mode=True,
    )
    task.update_statistics(ensemble, output_performance=False)
    metrics = task.get_performance_metrics()
    lats = np.asarray(task.latencies[BURN_IN_BATCHES:]
                      if len(task.latencies) > BURN_IN_BATCHES
                      else task.latencies)
    return {
        **asdict(cfg),
        "latency_mean_s": float(lats.mean()),
        "latency_std_s": float(lats.std()),
        "metrics": {k: float(v) for k, v in metrics.items()},
        "device": str(jax.devices()[0]),
    }


def run_sweep(configs, cache_path: str, trace_dir: str | None = None) -> dict:
    """JSON-cached sweep with resume (run_prediction.py:127-141 pattern)."""
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    for cfg in configs:
        if cfg.key() in cache:
            print("cached:", cfg.key())
            continue
        print("profiling:", cfg.key())
        cache[cfg.key()] = profile_config(cfg, trace_dir)
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
    return cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=["PreResNet20"])
    p.add_argument("--dataset", type=str, default="CIFAR10")
    p.add_argument("--precisions", nargs="*", default=["fp32", "bf16"])
    p.add_argument("--ensemble_sizes", nargs="*", type=int, default=[1, 6])
    p.add_argument("--batch_sizes", nargs="*", type=int, default=[1, 128])
    p.add_argument("--cache", type=str, default="latency_cache.json")
    p.add_argument("--trace_dir", type=str, default=None)
    p.add_argument("--table", action="store_true", help="print LaTeX table")
    args = p.parse_args(argv)

    configs = [
        ProfileConfig(m, args.dataset, prec, s, b)
        for m in args.models
        for prec in args.precisions
        for s in args.ensemble_sizes
        for b in args.batch_sizes
    ]
    cache = run_sweep(configs, args.cache, args.trace_dir)
    if args.table:
        from .tables import make_latex_table

        print(make_latex_table(cache))
    return cache


if __name__ == "__main__":
    main()
