"""Step-time decomposition for TVResNet50 224^2/1000-way bs128 bf16 training.

assets/imagenet_train_bench.json reports the in-HBM SGHMC epoch at ~20
steps/s = ~31% MFU while the bs1 eval engines reach 61% — this driver
answers whether the training gap is the conv-BACKWARD ceiling at this
shape (XLA's attainable speed for grad-of-conv at 224^2, filter + input
gradients) or harness overhead (permutation gather + flip + update inside
the scanned epoch program), the same question preresnet_decomp.py settled
for the flagship. Components, each as K iterations inside one jitted
fori_loop with a single device fetch (the ~28 ms tunnel RPC stays <3% of
every window — CLAUDE.md amortization rule):

  fwd      : inference forward (train=False), K=60  (~1 s window)
  fwd_bwd  : value_and_grad of the training loss (train mode, BN
             mutation, every grad leaf kept live), K=40 (~2 s window)
  epoch    : the production scanned epoch program over the in-HBM split,
             4 epochs x 16 steps per fetch (~3 s window)

Reference anchor: trtprof trains/loads torchvision resnet50
(/root/reference/URSABench/trtprof/to_onnx.py:37) — the train-side
counterpart of the committed eval-engine rows.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/rn50_decomp.py
"""

import json
import os
import time

import numpy as np

from imagenet_train_bench import _synth_imagenet, BATCH, SIZE, CH, CLASSES
from rn50_common import make_fwd_bwd_k, timed_best_per_iter

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "rn50_decomp.json")
)

N_TRAIN = 2048
K_FWD = 60
K_BWD = 40
REPS = 3
EPOCHS_PER_WINDOW = 4


def main():
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import inference, models
    from ursabench_tpu.data.arrays import DataSplit
    from ursabench_tpu.data.transforms import ImageSpec
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.profiling.hw import device_peaks, train_step_cost
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    spec = ImageSpec(SIZE, CH, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
                     random_flip=True)
    module = models.get_model("TVResNet50").build(CLASSES, dtype=jnp.bfloat16)
    v = init_variables(module, jax.random.PRNGKey(0), spec.shape)
    params, bstats = v["params"], v.get("batch_stats", {})
    x0 = jnp.zeros((BATCH,) + spec.shape, jnp.float32)
    y0 = jnp.zeros((BATCH,), jnp.int32)
    peak, _ = device_peaks()
    flops_step = train_step_cost(module, spec.shape, BATCH)["flops"]
    out = {"device": str(jax.devices()[0]),
           "model": f"TVResNet50 {SIZE}^2/{CLASSES}-way bs{BATCH} bf16",
           "flops_per_step": flops_step}

    def timed_loop(fn_k, k, *args_):
        np.asarray(jax.tree.leaves(fn_k(*args_))[0])  # compile + first exec
        np.asarray(jax.tree.leaves(fn_k(*args_))[0])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fn_k(*args_))[0])
            best = min(best, (time.perf_counter() - t0) / k)
        return best

    def row(label, seconds, with_mfu=True):
        r = {"ms": round(seconds * 1e3, 3),
             "steps_per_sec": round(1.0 / seconds, 2)}
        if with_mfu and peak:
            r["mfu_pct_of_bf16_peak"] = round(
                flops_step / seconds / peak * 100, 1)
        out[label] = r
        print(label, r, flush=True)

    # -- fwd only -----------------------------------------------------------
    def fwd_k(params, bstats, x):
        def body(_, carry):
            xi, acc = carry
            logits = module.apply({"params": params, "batch_stats": bstats},
                                  xi, train=False)
            s = jnp.sum(logits.astype(jnp.float32))
            return (x + jnp.float32(1e-30) * s, acc + s)

        return jax.lax.fori_loop(0, K_FWD, body, (x, jnp.float32(0.0)))[1]

    row("fwd", timed_loop(jax.jit(fwd_k), K_FWD, params, bstats, x0),
        with_mfu=False)

    # -- fwd + bwd: the SHARED harness (rn50_common.make_fwd_bwd_k) so the
    # batch-scaling cross-check provably times the same program ------------
    row("fwd_bwd", timed_best_per_iter(
        make_fwd_bwd_k(module, K_BWD), K_BWD, REPS, params, bstats, x0, y0))

    # -- production epoch step ----------------------------------------------
    images, labels = _synth_imagenet(N_TRAIN, seed=0)
    split = DataSplit(images, labels, batch_size=BATCH, spec=spec)
    sampler = inference.SGHMC(
        {"lr": 0.05, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
         "burn_in_epochs": 0},
        model=module, train=split, key=jax.random.PRNGKey(0),
    )
    sync = lambda: np.asarray(
        jnp.sum(jax.tree.leaves(sampler._state.params)[0].astype(jnp.float32)))
    sampler._run_epoch(True); sync()
    sampler._run_epoch(True); sync()
    nb = split.num_batches
    best_ep = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(EPOCHS_PER_WINDOW):
            sampler._run_epoch(True)
        sync()
        best_ep = min(best_ep,
                      (time.perf_counter() - t0) / (EPOCHS_PER_WINDOW * nb))
    row("epoch_step", best_ep)
    out["harness_overhead_pct"] = round(
        (out["epoch_step"]["ms"] / out["fwd_bwd"]["ms"] - 1.0) * 100, 1)

    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
