"""Regenerate the committed latency table with device-amortized numbers.

Per-call rows (protocol-faithful, RPC-floor-bound over the axon tunnel) are
reused from the existing assets/latency_table.json cache; this driver adds
the device-amortized K-forward engine measurement (chip-true latency, filled
achieved_tflops / mfu_pct_of_bf16_peak / HBM-traffic columns) for every
configuration, then rewrites assets/latency_table.{json,tex}.

K is sized per (model, batch) so that RPC/K << per-forward device time:
probe v2 (assets/pallas_matvec_probe2.json) measured the tunnel's
device->host fetch at ~28-33 ms PER CALL, so a K-forward loop reads
RPC/K high. The round-2 table used K=1000/100, which inflated the
PreResNet-20 rows by 30-60% (28 us on a ~46 us bs1 forward; 280 us on a
~0.2-0.8 ms bs128 forward). PreResNet rows now use K=20000/2000
(RPC term < 3%); WideResNet/ImageNet rows were already <3% and keep
their cached K (run_sweep re-measures when the requested K grows).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/latency_suite.py
"""

import json
import os
import time

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "latency_table.json")
)
TEX = ASSET[:-5] + ".tex"


def main():
    from ursabench_tpu.profiling.latency import ProfileConfig, run_sweep
    from ursabench_tpu.profiling.tables import make_latex_table
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    t00 = time.perf_counter()
    K_BY_MODEL_BATCH = {
        # MLP ensembles: the reference's table spans MLPEnsemble/
        # MLPEnsemble2 (trtprof/utils.py:22-128, make_table.py:26-83);
        # a bs1 MLP forward is ~us-scale so K must drown the ~28 ms
        # fetch RPC (amortization rule)
        ("MLP200MNIST", "MNIST", 1): 100000,
        ("MLP200MNIST", "MNIST", 128): 10000,
        ("PreResNet20", "CIFAR10", 1): 20000,
        ("PreResNet20", "CIFAR10", 128): 2000,
        ("WideResNet28x10", "CIFAR10", 1): 1000,  # ~1.6 ms/fwd: RPC 1.7%
        ("WideResNet28x10", "CIFAR10", 128): 100,  # >=10 ms/fwd: RPC <0.3%
    }
    for (model, dataset, batch_size), loop_k in K_BY_MODEL_BATCH.items():
        configs = [
            ProfileConfig(model, dataset, prec, s, batch_size)
            for prec in ("fp32", "bf16", "int8")
            for s in (1, 6)
        ]
        run_sweep(configs, ASSET, amortize_k=loop_k, per_call=True,
                  member_strategy="auto")
        print(f"{model} bs{batch_size} done at "
              f"{time.perf_counter() - t00:.0f}s", flush=True)
    with open(ASSET) as f:
        cache = json.load(f)
    with open(TEX, "w") as f:
        f.write(make_latex_table(cache))
    print("wrote", ASSET, "and", TEX)
    # headline deltas the table should show
    g = lambda m, p, s, b: cache[f"{m}.CIFAR10.{p}.ensemble{s}.bs{b}"]
    wrn1 = g("WideResNet28x10", "bf16", 6, 1)
    pre1 = g("PreResNet20", "bf16", 6, 1)
    print(json.dumps({
        "wrn_bs1_ens6_bf16_device_ms": wrn1["amortized_latency_s"] * 1e3,
        "pre_bs1_ens6_bf16_device_ms": pre1["amortized_latency_s"] * 1e3,
        "wrn_over_pre_ratio": wrn1["amortized_latency_s"]
        / pre1["amortized_latency_s"],
        "int8_vs_bf16_wrn_bs1_ens6": g("WideResNet28x10", "int8", 6, 1)[
            "amortized_latency_s"] / wrn1["amortized_latency_s"],
    }, indent=1))


if __name__ == "__main__":
    main()
