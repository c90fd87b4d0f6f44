"""Step-time decomposition for the PreResNet-20/CIFAR-10 bs128 headline.

The flagship bench config runs at ~21% MFU single-chain (BENCH_r02) — this
driver measures WHERE the time goes, so the "overhead-bound small convs"
claim is a number, not an assertion. Each component runs K iterations
inside one jitted lax.fori_loop (serial-chained; see profiling/latency.py)
so the quotient is chip execution time with zero dispatch overhead. K must
swamp the ~28 ms tunnel RPC paid by the single fetch: at the original
K=200 every component read 0.14 ms high, which made fwd+bwd (0.753 ms)
appear SLOWER than the full production epoch step (0.724 ms, whose fetch
amortizes over 780 scanned steps) — see benchmarks/pallas_matvec_probe2.py
for the RPC measurement. K=2000 puts the RPC term at ~14 us (<3%):

  fwd         : inference forward only (train=False)
  fwd_bwd     : value_and_grad of the training loss (train mode, BN mutation)
  fwd_bwd_upd : + the SGHMC update (momentum/noise/wd pytree op)
  epoch_step  : one full epoch via the production scanned epoch program
                (gather + normalize + crop/flip einsum augment + update),
                divided by num_batches — the number bench.py reports
  chains8     : the same fwd_bwd vmapped over 8 chains, per-chain rate

MFU uses XLA's own flops count for the fwd+bwd program (train_step_cost).
Optionally writes a profiler trace of a timed epoch (--trace_dir).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/preresnet_decomp.py
"""

import argparse
import json
import os
import time

import numpy as np

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "preresnet_decomp.json")
)

K = 2000
REPS = 3
EPOCHS_PER_WINDOW = 4  # 4 x 390 scanned steps per fetch: RPC/step ~2.5%


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ursabench_tpu import data, inference, models
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.ops.sgmcmc import sghmc_update
    from ursabench_tpu.profiling.hw import device_peaks, train_step_cost
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", type=str, default=None)
    args = ap.parse_args()

    batch = 128
    splits, C = data.loaders("CIFAR10", os.environ.get("URSA_DATA", "./data"),
                             batch_size=batch, use_validation=False)
    train = splits["train"]
    module = models.get_model("PreResNet20").build(C)
    v = init_variables(module, jax.random.PRNGKey(0), (32, 32, 3))
    params, bstats = v["params"], v.get("batch_stats", {})
    x0 = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    y0 = jnp.zeros((batch,), jnp.int32)
    peak, _ = device_peaks()
    flops_step = train_step_cost(module, (32, 32, 3), batch)["flops"]

    def timed_loop(fn_k, *args_):
        np.asarray(jax.tree.leaves(fn_k(*args_))[0])  # compile + first exec
        np.asarray(jax.tree.leaves(fn_k(*args_))[0])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fn_k(*args_))[0])
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    # -- fwd only ----------------------------------------------------------
    def fwd_k(params, bstats, x):
        def body(_, carry):
            xi, acc = carry
            logits = module.apply({"params": params, "batch_stats": bstats},
                                  xi, train=False)
            s = jnp.sum(logits.astype(jnp.float32))
            return (x + jnp.float32(1e-30) * s, acc + s)

        return jax.lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))[1]

    t_fwd = timed_loop(jax.jit(fwd_k), params, bstats, x0)

    # -- fwd + bwd ---------------------------------------------------------
    def loss_fn(p, b, x, y):
        variables = {"params": p}
        if b:
            variables["batch_stats"] = b
        logits, mut = module.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.mean(), mut.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def fwd_bwd_k(params, bstats, x, y):
        def body(_, carry):
            xi, acc = carry
            (loss, _), grads = grad_fn(params, bstats, xi, y)
            # EVERY grad leaf must feed the carry: keeping only one leaf
            # lets XLA dead-code-eliminate the other leaves' weight-grad
            # matmuls (~half the backward); 1e-30 is not compile-foldable
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            s = loss + jnp.float32(1e-30) * gsum
            return (x + jnp.float32(1e-30) * s, acc + s)

        return jax.lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))[1]

    t_fwd_bwd = timed_loop(jax.jit(fwd_bwd_k), params, bstats, x0, y0)

    # -- fwd + bwd + SGHMC update (params chain themselves) ----------------
    def upd_k(params, bstats, x, y, key):
        mom0 = jax.tree.map(jnp.zeros_like, params)

        def body(i, carry):
            p, m = carry
            (_, _), grads = grad_fn(p, bstats, x, y)
            p, m = sghmc_update(
                p, m, grads, lr=jnp.float32(0.01), momentum=jnp.float32(0.9),
                wd_over_n=jnp.float32(1e-5), n_train=jnp.float32(50000.0),
                noise_on=jnp.float32(1.0), is_first_step=(i == 0),
                key=jax.random.fold_in(key, i),
            )
            return (p, m)

        return jax.lax.fori_loop(0, K, body, (params, mom0))

    t_upd = timed_loop(jax.jit(upd_k), params, bstats, x0, y0,
                       jax.random.PRNGKey(1))

    # -- production epoch step --------------------------------------------
    sampler = inference.SGHMC(
        {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
         "burn_in_epochs": 1},
        model=module, train=train, key=jax.random.PRNGKey(0),
    )
    sync = lambda: np.asarray(
        jnp.sum(jax.tree.leaves(sampler._state.params)[0]))
    sampler._run_epoch(True); sync()
    sampler._run_epoch(True); sync()
    best_ep = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(EPOCHS_PER_WINDOW):
            sampler._run_epoch(True)
        sync()
        best_ep = min(best_ep, (time.perf_counter() - t0) / EPOCHS_PER_WINDOW
                      / train.num_batches)
    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            sampler._run_epoch(True)
            sync()

    # -- 8 chains, both strategies: the vmap row documents the grouped-
    # convolution pathology, the scan row (the production 'auto' pick for
    # conv models) must aggregate >= ~single-chain throughput
    def time_chains8(strategy):
        s8 = inference.SGHMC(
            {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
             "burn_in_epochs": 1},
            model=module, train=train, key=jax.random.PRNGKey(0), chains=8,
            chain_strategy=strategy,
        )
        sync8 = lambda: np.asarray(
            jnp.sum(jax.tree.leaves(s8._state.params)[0]))
        s8._run_epoch(True); sync8()
        s8._run_epoch(True); sync8()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            s8._run_epoch(True)
            sync8()
            best = min(best, (time.perf_counter() - t0) / train.num_batches)
        return best

    best8 = time_chains8("vmap")
    best8_scan = time_chains8("scan")

    def row(t, flops=flops_step):
        out = {"ms": round(t * 1e3, 4), "steps_per_sec": round(1 / t, 1)}
        if flops and peak:
            out["mfu_pct_of_bf16_peak"] = round(flops / t / peak * 100, 1)
        return out

    result = {
        "device": str(jax.devices()[0]),
        "model": "PreResNet20/CIFAR10 bs128 fp32",
        "loop_k": K,
        "fwd": row(t_fwd, None),
        "fwd_bwd": row(t_fwd_bwd),
        "fwd_bwd_update": row(t_upd),
        "epoch_step": row(best_ep),
        "harness_overhead_pct": round((best_ep / t_upd - 1) * 100, 1),
        "chains8_vmap_per_chain": row(best8, None),
        "chains8_vmap_aggregate": {
            "steps_per_sec": round(8 / best8, 1),
            "mfu_pct_of_bf16_peak": (
                round(8 * flops_step / best8 / peak * 100, 1)
                if flops_step and peak else None),
        },
        "chains8_scan_per_chain": row(best8_scan, None),
        "chains8_scan_aggregate": {
            "steps_per_sec": round(8 / best8_scan, 1),
            "mfu_pct_of_bf16_peak": (
                round(8 * flops_step / best8_scan / peak * 100, 1)
                if flops_step and peak else None),
        },
    }
    with open(ASSET, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
