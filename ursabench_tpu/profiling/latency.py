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


def _prep_forward(module, params, batch_stats, precision,
                  member_strategy="vmap"):
    """Shared engine front-end: returns (fn, params, batch_stats) where
    fn(params, batch_stats, x) -> posterior-mean probabilities. bf16 casts
    params + activations (fp32 accumulation on the MXU via
    preferred_element_type default). 'int8' stores kernels as symmetric
    per-output-channel int8 and dequantizes to bf16 inside the engine
    (trtexec --int8 analogue; weights occupy 4x less HBM, the batch-1
    bound) — see quantize.py.

    ``member_strategy`` picks how the S ensemble members execute:
    'vmap' batches them into one program (weights become a batched conv
    operand); 'scan' runs them sequentially inside one lax.scan, reusing
    the single-member kernels — XLA lowers weight-vmapped convs to
    grouped convolutions, which is far slower at small batch (measured
    on v5e, WRN-28x10 bs1 S=6: 4.24 ms vmap vs 1.63 ms scan bf16,
    1.22 ms scan int8) and still loses on big-spatial models at real
    batch sizes (INResNet50 224x224 bs32 S=2 bf16: 91.5 ms vmap vs
    81.3 ms scan). The batched path only wins, narrowly, on small-spatial
    models at large batch (WRN 32x32 bs128 S=6: 61.8 ms vmap vs ~64 ms
    scan). 'auto' (profile_config) picks scan iff S > 1 and
    (batch_size <= 8 or input spatial >= 64)."""
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

    n_members = jax.tree.leaves(params)[0].shape[0]

    def fn(params, batch_stats, x):
        def one(p, b):
            variables = {"params": decode(p)}  # per-member: dequant fuses
            if b is not None:
                variables["batch_stats"] = b
            return module.apply(variables, x.astype(dtype), train=False)

        def probs_of(p, b):
            # posterior-mean probabilities (consistent with export.py)
            return jnp.exp(
                jax.nn.log_softmax(one(p, b).astype(jnp.float32), axis=-1)
            )

        if member_strategy == "scan":
            m0 = jax.tree.map(lambda a: a[0], params)
            b0 = (None if batch_stats is None
                  else jax.tree.map(lambda a: a[0], batch_stats))
            out = jax.eval_shape(probs_of, m0, b0)
            zero = jnp.zeros(out.shape, jnp.float32)
            if batch_stats is None:
                body = lambda acc, p: (acc + probs_of(p, None), None)
                total, _ = jax.lax.scan(body, zero, params)
            else:
                body = lambda acc, pb: (acc + probs_of(*pb), None)
                total, _ = jax.lax.scan(body, zero, (params, batch_stats))
            return total / n_members

        assert member_strategy == "vmap", member_strategy
        bs_axis = None if batch_stats is None else 0
        probs = jax.vmap(probs_of, in_axes=(0, bs_axis))(params, batch_stats)
        return probs.mean(0)

    return fn, params, batch_stats


def _scale_scan_cost(engine, params, member_strategy):
    """XLA's cost analysis counts a scan body ONCE; for the member-scan
    engine the body is one member's forward, so flops/bytes must scale by
    S for the whole-ensemble columns to be honest."""
    if member_strategy != "scan":
        return
    import jax as _jax

    n = _jax.tree.leaves(params)[0].shape[0]
    if engine.cost_flops:
        engine.cost_flops *= n
    if engine.cost_bytes:
        engine.cost_bytes *= n


def _attach_cost(engine, compiled):
    """XLA's own flops/bytes counts -> achieved TFLOP/s, percent-of-peak and
    HBM-traffic columns in the results."""
    engine.cost_flops = engine.cost_bytes = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            if "flops" in ca:
                engine.cost_flops = float(ca["flops"])
            if "bytes accessed" in ca:
                engine.cost_bytes = float(ca["bytes accessed"])
    except Exception:
        pass


def build_engine(module, params, batch_stats, batch_size, input_shape,
                 precision="fp32", member_strategy="vmap"):
    """AOT-compile the BMA forward — the 'TensorRT engine build'.
    Returns (compiled_fn, example_input)."""
    fn, params, batch_stats = _prep_forward(module, params, batch_stats,
                                            precision, member_strategy)
    x = jnp.zeros((batch_size,) + tuple(input_shape), jnp.float32)
    compiled = jax.jit(fn).lower(params, batch_stats, x).compile()
    engine = lambda xb: compiled(params, batch_stats, xb)
    _attach_cost(engine, compiled)
    _scale_scan_cost(engine, params, member_strategy)
    return engine, x


def build_amortized_engine(module, params, batch_stats, batch_size,
                           input_shape, precision="fp32", loop_k=100,
                           member_strategy="vmap"):
    """K serial forwards inside ONE jitted program — the chip-true engine.

    The per-call protocol (time_engine) is faithful to the TensorRT
    reference (prof.py:153-171: HtoD -> execute -> DtoH per call), but over
    a remote device tunnel every call pays the RPC round-trip (~28 ms on
    this stack), so small-model rows measure the tunnel, not the chip.
    This engine runs ``loop_k`` forwards in one lax.fori_loop, fetches
    once, and divides by K — the dispatch/fetch overhead amortizes to
    nothing and the quotient is device execution time.

    Each iteration's input is ``x + 1e-30 * sum(prev_probs)``: bit-exact
    x at runtime (the perturbation underflows against O(1) pixels) yet a
    true loop-carried dependency at compile time, so XLA can neither hoist
    the loop-invariant forward NOR hoist the int8 dequant out of the loop
    — every iteration re-reads the engine's stored weights from HBM, which
    is precisely the weight-streaming regime the int8 engines target.

    Returns (engine_k, example_input); engine_k.loop_k = K and
    engine_k.cost_flops / .cost_bytes are PER-FORWARD (XLA's cost analysis
    counts a while-loop body once — here that is exactly one forward).
    """
    fn, params, batch_stats = _prep_forward(module, params, batch_stats,
                                            precision, member_strategy)

    def fn_k(params, batch_stats, x):
        def body(_, carry):
            xi, acc = carry
            probs = fn(params, batch_stats, xi)
            s = jnp.sum(probs)
            return (x + jnp.float32(1e-30) * s, acc + s)

        _, acc = jax.lax.fori_loop(
            0, loop_k, body, (x, jnp.float32(0.0))
        )
        return acc

    x = jnp.zeros((batch_size,) + tuple(input_shape), jnp.float32)
    compiled = jax.jit(fn_k).lower(params, batch_stats, x).compile()
    engine_k = lambda xb: compiled(params, batch_stats, xb)
    _attach_cost(engine_k, compiled)
    _scale_scan_cost(engine_k, params, member_strategy)
    engine_k.loop_k = loop_k
    return engine_k, x


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


def time_amortized(engine_k, x, reps=5):
    """Time the K-forward loop engine: warm twice (the first execution of a
    program on the remote service pays a one-off setup cost), then ``reps``
    fetch-synced calls; returns (per_forward_mean_s, per_forward_std_s)."""
    for _ in range(2):
        np.asarray(engine_k(x))
    lats = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(engine_k(x))
        lats.append((time.perf_counter() - t0) / engine_k.loop_k)
    lats = np.asarray(lats)
    return float(lats.mean()), float(lats.std())


def _cost_fields(flops, bytes_, latency_s):
    """achieved TFLOP/s, percent-of-bf16-peak, and HBM GB/s for a measured
    per-forward latency. The percent-of-peak key divides by the device's
    bf16 peak for EVERY precision (fp32/int8 rows read as percent of the
    bf16 number, not of a per-precision peak) — named accordingly."""
    out = {}
    if not flops or not latency_s:
        return out
    from .hw import device_peaks

    achieved = flops / latency_s
    out["achieved_tflops"] = round(achieved / 1e12, 2)
    peak, hbm_peak = device_peaks()
    if peak:
        out["mfu_pct_of_bf16_peak"] = round(achieved / peak * 100, 1)
    if bytes_:
        out["hbm_bytes_accessed"] = int(bytes_)
        out["hbm_gb_per_sec"] = round(bytes_ / latency_s / 1e9, 1)
        if hbm_peak:
            out["hbm_bw_pct_of_peak"] = round(
                bytes_ / latency_s / hbm_peak * 100, 1
            )
    return out


def _resolve_spec(cfg: ProfileConfig, mcfg):
    """(input_shape, num_classes) for the engine build. The input shape
    follows the model config's eval transform (the reference instantiates
    its IN-ResNets at 32x32 for CIFAR, imagenet_resnet.py:156-159);
    'ImageNet' overrides to the trtprof rn50 engine setting — 224x224
    inputs, 1000-way head (to_onnx.py:96-99, dataset.py:37)."""
    if cfg.dataset == "ImageNet":
        return (224, 224, 3), 1000
    from ..data.sources import DATASET_PROFILES

    classes = DATASET_PROFILES.get(cfg.dataset, (None, None, 10))[2]
    return tuple(mcfg.transform_test.shape), classes


def profile_config(cfg: ProfileConfig, trace_dir: str | None = None,
                   amortize_k: int = 0, per_call: bool = True,
                   member_strategy: str = "vmap") -> dict:
    """Measure one engine configuration.

    ``per_call=True`` runs the protocol-faithful per-call timing (every rep
    pays dispatch + device->host fetch — on a remote tunnel this includes
    the ~28 ms RPC floor; see time_engine). ``amortize_k=K`` additionally
    (or, with per_call=False, solely) measures the device-amortized
    K-forward loop engine, which is the chip-true number."""
    from .. import models
    from ..inference.engine import init_variables
    from ..util import tree_stack

    mcfg = models.get_model(cfg.model)
    input_shape, num_classes = _resolve_spec(cfg, mcfg)
    module = mcfg.build(num_classes)
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.ensemble_size)
    variables = [init_variables(module, k, input_shape) for k in keys]
    params = tree_stack([v["params"] for v in variables])
    bstats = None
    if variables[0].get("batch_stats"):
        bstats = tree_stack([v["batch_stats"] for v in variables])

    if member_strategy == "auto":
        member_strategy = ("scan" if cfg.ensemble_size > 1
                           and (cfg.batch_size <= 8 or input_shape[0] >= 64)
                           else "vmap")
    out = {**asdict(cfg), "device": str(jax.devices()[0]),
           "amortized_member_strategy": member_strategy}
    flops = bytes_ = None
    if per_call:
        engine, x = build_engine(
            module, params, bstats, cfg.batch_size, input_shape,
            cfg.precision, member_strategy,
        )
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                mean, std = time_engine(engine, x)
        else:
            mean, std = time_engine(engine, x)
        out.update(
            latency_mean_s=mean, latency_std_s=std,
            images_per_sec=cfg.batch_size / mean,
        )
        flops, bytes_ = engine.cost_flops, engine.cost_bytes

    if amortize_k:
        engine_k, x = build_amortized_engine(
            module, params, bstats, cfg.batch_size, input_shape,
            cfg.precision, loop_k=amortize_k,
            member_strategy=member_strategy,
        )
        amean, astd = time_amortized(engine_k, x)
        if flops is None:
            flops, bytes_ = engine_k.cost_flops, engine_k.cost_bytes
        out.update(
            amortized_latency_s=amean, amortized_latency_std_s=astd,
            amortized_loop_k=engine_k.loop_k,
            amortized_images_per_sec=cfg.batch_size / amean,
            **_cost_fields(flops, bytes_, amean),
        )
    elif per_call:
        out.update(**_cost_fields(flops, bytes_, out["latency_mean_s"]))
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


def run_sweep(configs, cache_path: str, trace_dir: str | None = None,
              amortize_k: int = 0, per_call: bool = True,
              member_strategy: str = "vmap") -> dict:
    """JSON-cached sweep with resume (run_prediction.py:127-141 pattern).
    A cached entry is re-measured only for the missing mode (e.g. a
    round-2 per-call-only cache gains amortized fields in place), or when
    the requested ``amortize_k`` exceeds the cached one — a bigger K means
    the caller decided the cached loop under-amortized the ~28 ms tunnel
    RPC (RPC/K must stay << the per-forward time; see
    benchmarks/pallas_matvec_probe2.py for the measurement)."""
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    for cfg in configs:
        prev = cache.get(cfg.key(), {})
        need_call = per_call and "latency_mean_s" not in prev
        need_amort = amortize_k and (
            "amortized_latency_s" not in prev
            or prev.get("amortized_loop_k", 0) < amortize_k
        )
        if not (need_call or need_amort):
            print("cached:", cfg.key())
            continue
        print("profiling:", cfg.key(),
              f"(per_call={need_call}, amortize_k={amortize_k if need_amort else 0})")
        res = profile_config(cfg, trace_dir,
                             amortize_k=amortize_k if need_amort else 0,
                             per_call=need_call,
                             member_strategy=member_strategy)
        if not need_amort and "amortized_latency_s" in prev:
            # a per-call-only re-measure must not overwrite the cached
            # amortized-derived cost fields with RPC-floored per-call ones
            # (the amortized latency is the chip-true basis for MFU/HBM)
            for k in ("achieved_tflops", "mfu_pct_of_bf16_peak",
                      "hbm_bytes_accessed", "hbm_gb_per_sec",
                      "hbm_bw_pct_of_peak"):
                res.pop(k, None)
        cache[cfg.key()] = {**prev, **res}
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
    p.add_argument("--amortize_k", type=int, default=0,
                   help="also measure the K-forward device-amortized engine")
    p.add_argument("--no_per_call", action="store_true",
                   help="skip the per-call protocol timing")
    p.add_argument("--member_strategy", choices=["vmap", "scan", "auto"],
                   default="auto",
                   help="ensemble member execution: batched (vmap) or "
                        "sequential-in-one-program (scan; wins at batch 1)")
    p.add_argument("--table", action="store_true", help="print LaTeX table")
    args = p.parse_args(argv)

    configs = [
        ProfileConfig(m, args.dataset, prec, s, b)
        for m in args.models
        for prec in args.precisions
        for s in args.ensemble_sizes
        for b in args.batch_sizes
    ]
    cache = run_sweep(configs, args.cache, args.trace_dir,
                      amortize_k=args.amortize_k,
                      per_call=not args.no_per_call,
                      member_strategy=args.member_strategy)
    if args.table:
        from .tables import make_latex_table

        print(make_latex_table(cache))
    return cache


if __name__ == "__main__":
    main()
