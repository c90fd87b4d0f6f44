"""Headline benchmark: SGHMC sampler throughput on PreResNet-20/CIFAR-10.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over the PyTorch-CPU reference protocol measured
by benchmarks/torch_cpu_baseline.py (assets/baseline_cpu.json). The sampler
epoch is the reference's hot loop (sghmc.py:72-87) as one compiled
lax.scan; BMA eval is the prediction.py:52-74 loop as one vmapped forward.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from ursabench_tpu import data, inference, models
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.util import softmax_probs, tree_stack

    batch = 128
    splits, num_classes = data.loaders(
        "CIFAR10", os.environ.get("URSA_DATA", "./data"), batch_size=batch,
        use_validation=False,
    )
    train, test = splits["train"], splits["test"]
    module = models.get_model("PreResNet20").build(num_classes)

    hyp = {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
           "burn_in_epochs": 1}
    sampler = inference.SGHMC(
        hyp, model=module, train=train, key=jax.random.PRNGKey(0)
    )
    # warmup epoch compiles the scan program
    sampler._run_epoch(noise_on=True)
    jax.block_until_ready(sampler._state.params)

    t0 = time.perf_counter()
    n_epochs = 2
    for _ in range(n_epochs):
        sampler._run_epoch(noise_on=True)
    jax.block_until_ready(sampler._state.params)
    t1 = time.perf_counter()
    steps_per_sec = n_epochs * train.num_batches / (t1 - t0)

    # BMA eval throughput: 5-member vmapped ensemble over the test split
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

    batches = list(test.batches())
    bma_probs(params, bstats, batches[0][0]).block_until_ready()  # compile
    t0 = time.perf_counter()
    n_imgs = 0
    out = None
    for x, _ in batches:
        if x.shape[0] != batch:
            continue
        out = bma_probs(params, bstats, x)
        n_imgs += x.shape[0]
    # block on the LAST OUTPUT: blocking on an input is a no-op under JAX
    # async dispatch and would time the enqueue rate, not the compute
    out.block_until_ready()
    t1 = time.perf_counter()
    images_per_sec = n_imgs / (t1 - t0)

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
        "bma_images_per_sec": round(images_per_sec, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
