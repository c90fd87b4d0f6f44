"""Stretch benchmark: WideResNet-28x10 / CIFAR-100 SGHMC throughput + BMA
eval (BASELINE.md config 4: "50x sampler steps/sec and BMA eval throughput
vs the PyTorch-CPU reference on WideResNet-28x10/CIFAR-100").

Usage:
  python benchmarks/wrn_stretch_bench.py            # TPU measurement
  python benchmarks/wrn_stretch_bench.py --torch    # CPU reference protocol

Writes/updates assets/stretch_bench.json.
"""

import argparse
import json
import os
import time

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets", "stretch_bench.json")
)


def run_tpu(steps: int, members: int):
    import jax

    from ursabench_tpu import data, inference, models
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.profiling.hw import device_peaks, train_step_cost
    from ursabench_tpu.util import enable_compilation_cache, tree_stack
    import jax.numpy as jnp

    enable_compilation_cache()
    batch = 128
    splits, C = data.loaders("CIFAR100", os.environ.get("URSA_DATA", "./data"),
                             batch_size=batch, use_validation=False)
    nb = splits["train"].num_batches
    peak_flops, _ = device_peaks()
    out = {}
    for tag, kw in (("", {}), ("_bf16", {"dtype": jnp.bfloat16})):
        module = models.get_model("WideResNet28x10").build(C, **kw)
        sampler = inference.SGHMC(
            {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
             "burn_in_epochs": 1},
            model=module, train=splits["train"], key=jax.random.PRNGKey(0),
        )
        import numpy as np

        # host-fetch sync: block_until_ready can return early on remote
        # device tunnels
        sync = lambda: np.asarray(
            jnp.sum(jax.tree.leaves(sampler._state.params)[0])
        )
        flops_step = train_step_cost(module, (32, 32, 3), batch)["flops"]
        sampler._run_epoch(True)  # compile
        sync()
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            sampler._run_epoch(True)
            sync()
            best = max(best, nb / (time.perf_counter() - t0))
        out[f"tpu_sghmc_steps_per_sec{tag}"] = best
        if flops_step is not None:
            achieved = best * flops_step
            out[f"tpu_sghmc_tflops{tag}"] = round(achieved / 1e12, 1)
            if peak_flops:
                out[f"tpu_sghmc_mfu_pct{tag}"] = round(
                    achieved / peak_flops * 100, 1
                )
    import numpy as np

    from ursabench_tpu.inference.ensemble import Ensemble
    from ursabench_tpu.tasks.base import accumulate_split

    # measure the PRODUCTION eval path: the whole test split as one scanned
    # device program (accumulate_split). A per-batch dispatch loop pays the
    # ~28ms tunnel RTT per call on remote devices and reads ~2x low.
    for tag, kw in (("", {}), ("_bf16", {"dtype": jnp.bfloat16})):
        module = models.get_model("WideResNet28x10").build(C, **kw)
        keys = jax.random.split(jax.random.PRNGKey(1), members)
        variables = [init_variables(module, k, (32, 32, 3)) for k in keys]
        params = tree_stack([v["params"] for v in variables])
        bstats = tree_stack([v["batch_stats"] for v in variables])
        ens = Ensemble(module, params, bstats, members)
        test = splits["test"]
        accumulate_split(ens, test, smooth_probs=False)  # compile + first-exec
        t0 = time.perf_counter()
        accumulate_split(ens, test, smooth_probs=False)  # returns numpy: synced
        out[f"tpu_bma_images_per_sec{tag}"] = (
            test.n / (time.perf_counter() - t0)
        )
    out["tpu_device"] = str(jax.devices()[0])
    return out


def run_torch(steps: int, members: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class WideBasic(nn.Module):
        def __init__(self, cin, planes, stride=1):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, planes, 3, 1, 1, bias=True)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=True)
            self.short = (
                nn.Conv2d(cin, planes, 1, stride, bias=True)
                if stride != 1 or cin != planes else None
            )

        def forward(self, x):
            out = self.conv1(F.relu(self.bn1(x)))
            out = self.conv2(F.relu(self.bn2(out)))
            return out + (self.short(x) if self.short is not None else x)

    class WRN2810(nn.Module):
        def __init__(self, num_classes=100):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 16, 3, 1, 1, bias=True)
            layers = []
            cin = 16
            for planes, stride in ((160, 1), (320, 2), (640, 2)):
                for i in range(4):
                    layers.append(WideBasic(cin, planes, stride if i == 0 else 1))
                    cin = planes
            self.layers = nn.Sequential(*layers)
            self.bn = nn.BatchNorm2d(640, momentum=0.9)
            self.fc = nn.Linear(640, num_classes)

        def forward(self, x):
            out = self.layers(self.conv1(x))
            out = F.relu(self.bn(out))
            out = F.avg_pool2d(out, 8).flatten(1)
            return self.fc(out)

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_cpu_baseline import sghmc_step  # the real SGHMC update

    torch.manual_seed(0)
    batch = 128
    model = WRN2810().train()
    x = torch.randn(batch, 3, 32, 32)
    y = torch.randint(0, 100, (batch,))
    bufs = [None] * len(list(model.parameters()))
    # warmup
    model.zero_grad(); F.cross_entropy(model(x), y).backward()
    sghmc_step(model, bufs, 0.01, 0.9, 1.0, 50000)
    t0 = time.perf_counter()
    for _ in range(steps):
        model.zero_grad()
        F.cross_entropy(model(x), y).backward()
        sghmc_step(model, bufs, 0.01, 0.9, 1.0, 50000)
    steps_per_sec = steps / (time.perf_counter() - t0)

    eval_models = [WRN2810().eval() for _ in range(members)]
    with torch.no_grad():
        eval_models[0](x)
        t0 = time.perf_counter()
        acc = torch.zeros(batch, 100)
        for m in eval_models:
            acc += F.log_softmax(m(x), -1).exp()
        images_per_sec = batch / (time.perf_counter() - t0)
    return {
        "cpu_sghmc_steps_per_sec": steps_per_sec,
        "cpu_bma_images_per_sec": images_per_sec,
        "cpu_threads": torch.get_num_threads(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--members", type=int, default=5)
    args = ap.parse_args()
    result = {}
    if os.path.exists(ASSET):
        with open(ASSET) as f:
            result = json.load(f)
    result.update(
        run_torch(args.steps, args.members) if args.torch
        else run_tpu(args.steps, args.members)
    )
    if ("tpu_sghmc_steps_per_sec" in result
            and "cpu_sghmc_steps_per_sec" in result):
        result["speedup_steps"] = (
            result["tpu_sghmc_steps_per_sec"] / result["cpu_sghmc_steps_per_sec"]
        )
        result["speedup_bma"] = (
            result["tpu_bma_images_per_sec"] / result["cpu_bma_images_per_sec"]
        )
    with open(ASSET, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
