"""Headline benchmark: SGHMC sampler throughput on PreResNet-20/CIFAR-10.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over the PyTorch-CPU reference protocol measured
by benchmarks/torch_cpu_baseline.py (assets/baseline_cpu.json). The sampler
epoch is the reference's hot loop (sghmc.py:72-87) as one compiled
lax.scan; BMA eval is the prediction.py:52-74 loop as one vmapped forward.

Measurement: best-of-REPS timed windows of EPOCHS_PER_REP whole epochs each
(a multi-second window so a GC pause or runtime hiccup can't move the
number), achieved FLOP/s from XLA's own cost model, and MFU vs the chip's
bf16 peak. A secondary bf16-compute run is reported alongside (fp32 is the
protocol dtype; on this model the MXU already runs fp32 matmuls through
bf16 passes, so fp32 is the faster end-to-end choice at this size).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

EPOCHS_PER_REP = 8  # 8x390 steps/fetch: the ~28 ms tunnel RPC drags <1.3%
REPS = 3


def device_sync(tree):
    """Host-fetch a scalar that depends on the computation. On remote device
    tunnels block_until_ready can return before execution finishes; fetching
    an execution's output is the reliable sync."""
    return np.asarray(jnp.sum(jax.tree.leaves(tree)[0]))


def _sghmc_throughput(module, train, reps=REPS, epochs=EPOCHS_PER_REP,
                      chains=1, return_strategy=False):
    """Best-of-reps PER-CHAIN steps/sec for the compiled SGHMC epoch
    program (``chains > 1`` advances all chains in one program — scan or
    vmap per engine.make_epoch_fn's auto rule; aggregate throughput is the
    return value times chains), plus XLA-reported flops per training step
    per chain."""
    from ursabench_tpu import inference
    from ursabench_tpu.profiling.hw import train_step_cost

    hyp = {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
           "burn_in_epochs": 1}
    sampler = inference.SGHMC(
        hyp, model=module, train=train, key=jax.random.PRNGKey(0),
        chains=chains,
    )
    flops_step = train_step_cost(module, train.spec.shape, train.batch_size)["flops"]
    # warmup epoch compiles the scan program
    sampler._run_epoch(noise_on=True)
    device_sync(sampler._state.params)

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(epochs):
            sampler._run_epoch(noise_on=True)
        device_sync(sampler._state.params)
        best = max(best, epochs * train.num_batches / (time.perf_counter() - t0))
    if return_strategy:
        return best, flops_step, sampler._epoch_fn._chain_strategy
    return best, flops_step


def main():
    from ursabench_tpu import data, models
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache, softmax_probs, tree_stack

    enable_compilation_cache()

    batch = 128
    splits, num_classes = data.loaders(
        "CIFAR10", os.environ.get("URSA_DATA", "./data"), batch_size=batch,
        use_validation=False,
    )
    train, test = splits["train"], splits["test"]
    cfg = models.get_model("PreResNet20")
    peak_flops, _ = device_peaks()

    def tflops_and_mfu(steps_per_sec, flops_per_step):
        if flops_per_step is None:
            return None, None
        achieved = steps_per_sec * flops_per_step
        m = achieved / peak_flops if peak_flops else None
        return round(achieved / 1e12, 2), (round(m * 100, 1) if m else None)

    steps_per_sec, flops_ep = _sghmc_throughput(cfg.build(num_classes), train)
    tflops, mfu_pct = tflops_and_mfu(steps_per_sec, flops_ep)
    # secondary sections are best-effort: on remote tunnels each extra
    # program pays a 100-250s first execution (CLAUDE.md), and a failure
    # there must not cost the headline JSON line
    try:
        steps_bf16, flops_bf16 = _sghmc_throughput(
            cfg.build(num_classes, dtype=jnp.bfloat16), train, reps=1
        )
        tflops_bf16, mfu_bf16 = tflops_and_mfu(steps_bf16, flops_bf16)
    except Exception:
        steps_bf16 = tflops_bf16 = mfu_bf16 = None

    # multi-chain section: chains advance inside ONE epoch program
    # (engine.make_epoch_fn chain_strategy; 'auto' resolves to scan for conv
    # models — weight-vmapped convs lower to grouped convolutions and
    # regress below single-chain, measured in assets/preresnet_decomp.json).
    # bf16 compute (the TPU dtype; the per-chain protocol is unchanged).
    # An aggregate below ~single-chain is flagged explicitly: chain
    # parallelism must never cost throughput vs running chains back-to-back.
    multichain = {}
    for n_chains in (4, 8):
        try:
            per_chain, flops_c, strategy = _sghmc_throughput(
                cfg.build(num_classes, dtype=jnp.bfloat16), train, reps=2,
                chains=n_chains, return_strategy=True,
            )
            agg = per_chain * n_chains
            tfl_c, mfu_c = tflops_and_mfu(agg, flops_c)
            row = {
                "per_chain_steps_per_sec": round(per_chain, 2),
                "aggregate_steps_per_sec": round(agg, 2),
                "tflops": tfl_c,
                "mfu_pct_of_bf16_peak": mfu_c,
                "chain_strategy": strategy,
            }
            if steps_bf16 and agg < steps_bf16:
                row["regression_vs_single_chain"] = round(agg / steps_bf16, 3)
            multichain[f"chains{n_chains}"] = row
        except Exception:
            pass

    # streamed (beyond-HBM) section: the same sampler fed by the C++ host
    # pipeline in chunked stage-to-HBM mode (VERDICT r4 item 9: the bench
    # must capture the streaming regression surface every round). On this
    # remote tunnel the path is transport-bound (assets/
    # imagenet_train_bench.json stream_decomposition), so the honest
    # number here is streamed steps/s and its fraction of the in-HBM rate.
    streamed_sps = None
    try:
        from ursabench_tpu import inference
        from ursabench_tpu.data.native import HostStreamingSplit

        stream = HostStreamingSplit(
            np.asarray(train.images), np.asarray(train.labels),
            batch_size=batch, spec=train.spec, chunk_batches=16,
        )
        s = inference.SGHMC(
            {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
             "burn_in_epochs": 1},
            model=cfg.build(num_classes), train=stream,
            key=jax.random.PRNGKey(0),
        )
        s._run_epoch(noise_on=True)  # compile + first-exec penalty
        device_sync(s._state.params)
        t0 = time.perf_counter()
        s._run_epoch(noise_on=True)
        device_sync(s._state.params)
        streamed_sps = stream.num_batches / (time.perf_counter() - t0)
    except Exception:
        pass

    # BMA eval throughput: 5-member vmapped ensemble over the test split
    module = cfg.build(num_classes)
    members = 5
    keys = jax.random.split(jax.random.PRNGKey(1), members)
    variables = [init_variables(module, k, train.spec.shape) for k in keys]
    params = tree_stack([v["params"] for v in variables])
    bstats = tree_stack([v["batch_stats"] for v in variables])

    @jax.jit
    def bma_probs(params, bstats, x):
        def one(p, b):
            return module.apply({"params": p, "batch_stats": b}, x, train=False)

        return softmax_probs(jax.vmap(one)(params, bstats)).mean(0)

    best_imgs = None
    bma_flops_batch = None
    try:
        from ursabench_tpu.profiling.hw import xla_cost

        batches = [b for b in test.batches() if b[0].shape[0] == batch]
        np.asarray(bma_probs(params, bstats, batches[0][0]))  # compile
        bma_flops_batch = xla_cost(bma_probs, params, bstats, batches[0][0])["flops"]

        # device-amortized sweep: K whole test-set passes inside ONE
        # program (scan over stacked batches x fori_loop over sweeps), one
        # fetch. A Python loop of per-batch dispatches measures the tunnel's
        # RPC pipelining, not the chip (observed 97k vs 122k img/s run to
        # run); with BMA_SWEEPS full sweeps per fetch the ~28 ms RPC term
        # is <3% of the window (latency-suite amortization rule).
        xs = jnp.stack([x for x, _ in batches])  # (nb, bs, H, W, C)
        BMA_SWEEPS = 16

        @jax.jit
        def bma_sweeps(params, bstats, xs):
            def sweep(carry, _):
                def body(c, x):
                    # nested jit traces inline — same program as the
                    # per-batch call whose flops xla_cost counted above
                    return c + bma_probs(params, bstats, x).sum(), None

                c, _ = jax.lax.scan(body, carry, xs)
                return c, None

            out, _ = jax.lax.scan(sweep, jnp.float32(0.0), None,
                                  length=BMA_SWEEPS)
            return out

        np.asarray(bma_sweeps(params, bstats, xs))  # compile + first exec
        best_imgs = 0.0
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(bma_sweeps(params, bstats, xs))  # fetch = true sync
            best_imgs = max(
                best_imgs,
                BMA_SWEEPS * len(batches) * batch / (time.perf_counter() - t0),
            )
    except Exception:
        pass

    bma_tflops = bma_mfu = None
    if best_imgs and bma_flops_batch:
        bma_tflops, bma_mfu = tflops_and_mfu(best_imgs / batch, bma_flops_batch)

    base_path = os.path.join(os.path.dirname(__file__), "assets", "baseline_cpu.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs = steps_per_sec / base["sghmc_steps_per_sec"]

    print(json.dumps({
        "metric": "SGHMC steps/sec (PreResNet-20/CIFAR-10, bs128)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "tflops": tflops,
        "mfu_pct_of_bf16_peak": mfu_pct,
        "bf16_steps_per_sec": round(steps_bf16, 2) if steps_bf16 else None,
        "bf16_tflops": tflops_bf16,
        "bf16_mfu_pct_of_bf16_peak": mfu_bf16,
        "multichain_bf16": multichain or None,
        "streamed_steps_per_sec": round(streamed_sps, 2) if streamed_sps
        else None,
        "streamed_pct_of_in_hbm": round(100 * streamed_sps / steps_per_sec, 1)
        if streamed_sps else None,
        "bma_images_per_sec": round(best_imgs, 1) if best_imgs else None,
        "bma_tflops": bma_tflops,
        "bma_mfu_pct_of_bf16_peak": bma_mfu,
        "timed_window": f"best of {REPS}x{EPOCHS_PER_REP} epochs",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
