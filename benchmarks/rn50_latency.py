"""ResNet-50 / ImageNet-shape ensemble latency rows for the committed table.

The reference's trtprof builds TensorRT engines for torchvision resnet50
ensembles at ImageNet shape (to_onnx.py:37,96-99 — configurable NCHW input,
rn50_ensemble_2 example; dataset.py:37 ImageNet normalization) alongside the
CIFAR-shape URSABench models. This driver adds the TPU-native equivalent:
INResNet50 ensemble-2 engines at 224x224/1000-way, fp32 vs bf16 vs int8,
device-amortized (chip-true) plus protocol-faithful per-call timing, appended
to assets/latency_table.{json,tex}.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/rn50_latency.py
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
    for batch_size, loop_k in ((1, 500), (32, 50)):
        configs = [
            ProfileConfig("INResNet50", "ImageNet", prec, 2, batch_size)
            for prec in ("fp32", "bf16", "int8")
        ]
        run_sweep(configs, ASSET, amortize_k=loop_k, per_call=True,
                  member_strategy="auto")
        print(f"bs{batch_size} done at {time.perf_counter() - t00:.0f}s",
              flush=True)
    # TVResNet50: the TRUE torchvision rn50 the reference's trtprof loads
    # (to_onnx.py:37) — 16x fewer conv flops than the CIFAR-adapted
    # INResNet50 at 224^2, so the amortization K is 10x larger to keep the
    # ~28 ms fetch RPC <3% of the loop window (CLAUDE.md landmine)
    for batch_size, loop_k in ((1, 5000), (32, 200)):
        configs = [
            ProfileConfig("TVResNet50", "ImageNet", prec, 2, batch_size)
            for prec in ("fp32", "bf16", "int8")
        ]
        run_sweep(configs, ASSET, amortize_k=loop_k, per_call=True,
                  member_strategy="auto")
        print(f"tv bs{batch_size} done at {time.perf_counter() - t00:.0f}s",
              flush=True)
    with open(ASSET) as f:
        cache = json.load(f)
    with open(TEX, "w") as f:
        f.write(make_latex_table(cache))
    g = lambda p, b: cache[f"INResNet50.ImageNet.{p}.ensemble2.bs{b}"]
    print(json.dumps({
        "rn50_bs1_ens2_bf16_device_ms": g("bf16", 1)["amortized_latency_s"]
        * 1e3,
        "rn50_bs1_int8_over_bf16": g("int8", 1)["amortized_latency_s"]
        / g("bf16", 1)["amortized_latency_s"],
        "rn50_bs32_bf16_mfu_pct": g("bf16", 32).get("mfu_pct_of_bf16_peak"),
    }, indent=1))


if __name__ == "__main__":
    main()
