"""ImageNet-shape TRAINING evidence: ResNet-50 SGHMC at 224^2/1000-way.

The reference commits BO-tuned hyperparameters for ResNet50ImageNet
(/root/reference/URSABench/hyperparams/ResNet50ImageNet/, 7 methods) and
builds rn50 ensemble inference engines from models *trained* by the same
system (trtprof/to_onnx.py:96-99) — so the train side needs a committed
number at that scale, not just the eval engines (assets/latency_table.json
INResNet50 rows). The model is TVResNet50 — the TRUE torchvision
architecture the reference's trtprof path loads (to_onnx.py:37), 7x7/2
stem + max-pool; the registry's CIFAR-adapted INResNet50 does 16x the
flops at 224^2 and is not what "rn50" means there. This driver measures,
on the current device:

  1. the chip ceiling: SGHMC epochs over an in-HBM DataSplit
     (steps/s, achieved TFLOP/s, MFU) — the 224^2 conv stack is the
     MXU-friendliest workload in the zoo, the counterpart of the committed
     61%-MFU bs1 eval engine;
  2. the beyond-HBM path: the same sampler over a HostStreamingSplit
     (the C++ host pipeline + double-buffered device_put) — on a remote
     TPU tunnel this is transfer-bound, which is the honest number for
     the streaming configuration on THIS transport;
  3. BMA evaluation of the harvested 2-member ensemble (images/s).

Synthetic data: throughput does not depend on label structure, so images
are uniform uint8 and labels uniform int — metric VALUES are meaningless
here and deliberately not reported (the calibrated-difficulty generator
would need a 600 MB 1000-class template bank at 224^2 for no measurement
benefit).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/imagenet_train_bench.py
"""

import json
import os
import time

import numpy as np

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "imagenet_train_bench.json")
)

N_TRAIN = 2048
N_TEST = 512
BATCH = 128  # standard large-batch RN50 training regime (fills the MXU)
SIZE, CH, CLASSES = 224, 3, 1000


def _synth_imagenet(n, seed):
    """File-memmapped uniform uint8 images (anonymous first-touch faults are
    ~170x slower with the PJRT plugin loaded — CLAUDE.md allocator landmine)."""
    root = os.environ.get("URSA_SYNTH_CACHE", "/tmp/ursabench_synth_cache")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"imagenet-bench-{n}-{seed}.x.npy")
    rng = np.random.default_rng(seed)
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        x = np.lib.format.open_memmap(
            tmp, mode="w+", dtype=np.uint8, shape=(n, SIZE, SIZE, CH))
        chunk = 128
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            x[lo:hi] = rng.integers(0, 256, (hi - lo, SIZE, SIZE, CH),
                                    dtype=np.uint8)
        x.flush()
        os.replace(tmp, path)
    images = np.load(path, mmap_mode="r")
    # a separate label stream: the image rng's position differs between
    # cache-miss and cache-hit runs
    labels = np.random.default_rng(seed + 10_000).integers(
        0, CLASSES, n).astype(np.int64)
    return images, labels


def main():
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import inference, models, tasks
    from ursabench_tpu.data.arrays import DataSplit
    from ursabench_tpu.data.native import HostStreamingSplit
    from ursabench_tpu.data.transforms import ImageSpec
    from ursabench_tpu.profiling.hw import device_peaks, train_step_cost
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    spec = ImageSpec(SIZE, CH, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
                     random_flip=True)
    images, labels = _synth_imagenet(N_TRAIN, seed=0)
    test_images, test_labels = _synth_imagenet(N_TEST, seed=1)

    module = models.get_model("TVResNet50").build(CLASSES, dtype=jnp.bfloat16)
    hyp = {"lr": 0.05, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
           "burn_in_epochs": 0}
    cost = train_step_cost(module, spec.shape, BATCH)
    flops_step = cost["flops"]
    peak, _ = device_peaks()
    out = {"device": str(jax.devices()[0]),
           "model": f"TVResNet50 {SIZE}^2/{CLASSES}-way bs{BATCH} bf16",
           "n_train": N_TRAIN, "flops_per_step": flops_step}

    def run_epochs(split, label, epochs):
        s = inference.SGHMC(hyp, model=module, train=split,
                            key=jax.random.PRNGKey(0))
        s._run_epoch(noise_on=True)  # compile + first-execution penalty
        np.asarray(jax.tree.leaves(s._state.params)[0][:1])  # fetch sync
        t0 = time.perf_counter()
        for _ in range(epochs):
            s._run_epoch(noise_on=True)
        np.asarray(jax.tree.leaves(s._state.params)[0][:1])
        dt = time.perf_counter() - t0
        steps = epochs * split.num_batches
        sps = steps / dt
        row = {"steps_per_sec": round(sps, 2),
               "images_per_sec": round(sps * BATCH, 1),
               "achieved_tflops": round(sps * flops_step / 1e12, 2)}
        if peak:
            row["mfu_pct_of_bf16_peak"] = round(
                sps * flops_step / peak * 100, 1)
        out[label] = row
        print(label, row, flush=True)
        return s

    # 1. chip ceiling: the whole (uint8) train set lives in HBM (~308 MB)
    hbm_split = DataSplit(images, labels, batch_size=BATCH, spec=spec)
    run_epochs(hbm_split, "in_hbm_epoch", epochs=3)

    # 2. beyond-HBM: batches stream through the C++ host pipeline +
    # double-buffered device_put (transfer-bound over a remote tunnel)
    stream = HostStreamingSplit(images, labels, batch_size=BATCH, spec=spec)
    sampler = run_epochs(stream, "streamed_epoch", epochs=1)

    # 3. BMA eval of the harvested ensemble (trained members, real weights)
    ens = sampler.sample(num_samples=2)
    test_split = DataSplit(test_images, test_labels, batch_size=BATCH,
                           spec=spec)
    task = tasks.Prediction({"in_distribution_test": test_split}, CLASSES,
                            metric_list=["error_rate"])
    task.update_statistics(ens, output_performance=False)  # compile + first
    task.reset()
    t0 = time.perf_counter()
    task.update_statistics(ens, output_performance=False)
    task.get_performance_metrics()
    dt = time.perf_counter() - t0
    out["bma_eval"] = {"members": ens.num_members,
                       "images_per_sec": round(N_TEST / dt, 1)}
    print("bma_eval", out["bma_eval"], flush=True)

    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
