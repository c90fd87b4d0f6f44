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
  2. the beyond-HBM DECOMPOSITION: the streamed pipeline's three stages
     measured separately — host gather (the C++ pipeline's take into warm
     staging buffers), raw H2D transport (a device_put loop of warm uint8
     batch buffers, each transfer forced by a device-side reduction and
     one dependent fetch at the end — the transport's speed-of-light on
     this link), and device step compute (from 1.). The binding stage sets
     ``bound_steps_per_sec``, the best any streaming schedule can do;
  3. the beyond-HBM path, both modes: per-batch streaming
     (HostStreamingSplit, double-buffered device_put of raw uint8) and
     CHUNKED stage-to-HBM streaming (chunk_batches=M: one device program
     scans M staged steps, amortizing per-step dispatch M-fold), each
     reported as a percentage of the decomposition bound;
  4. BMA evaluation of the harvested 2-member ensemble — DEVICE-AMORTIZED:
     K whole test-set sweeps inside one program (scan over stacked batches
     x fori over sweeps), one dependent fetch, mirroring bench.py's BMA
     methodology. A Python per-batch dispatch loop reads the tunnel's RPC
     pipelining instead of the chip (the r4 artifact's 188.9 img/s was
     that, ~0.6% MFU).

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
CHUNK = 4  # stage 4 batches (77 MB) per transfer; 16-batch epoch = 4 chunks
BATCH_BYTES = BATCH * SIZE * SIZE * CH  # uint8 transfer payload per step


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


def measure_host_gather(images, labels, reps=3):
    """ms/batch for the host gather stage alone: the C++ prefetch worker's
    job (dataio.cc worker_loop) is a random-row take of the uint8 dataset
    into a warm staging slot; np.take into a reused out= buffer is the
    same memory traffic, measured without the worker-thread overlap that
    the real pipeline gets for free."""
    from ursabench_tpu.data.native import permutation

    flat = np.asarray(images).reshape(images.shape[0], -1)
    out = np.empty((BATCH, flat.shape[1]), np.uint8)
    out[:] = 0  # touch pages once so timing sees warm buffers
    order = permutation(flat.shape[0], 123)
    nb = flat.shape[0] // BATCH
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(nb):
            np.take(flat, order[i * BATCH:(i + 1) * BATCH], axis=0, out=out)
        best = min(best, (time.perf_counter() - t0) / nb)
    return best * 1e3


def measure_h2d_ceiling(jax, jnp, images, k=16, reps=3):
    """Raw transport ceiling for THE ACTUAL DATA: device_put k DISTINCT
    batch-sized slices of the dataset; every transfer is forced by a
    device-side sum whose chained total is fetched once at the end (over
    this tunnel block_until_ready returns early — only a dependent
    device->host fetch is a real sync). Distinct real slices matter: the
    tunnel's effective rate is data-entropy-dependent (measured: constant
    bytes 79 MB/s, one uniform-random buffer re-put 42 MB/s, distinct
    random batches ~23 MB/s — the link compresses/dedups), so a synthetic
    repeated buffer reads 3-6x too high and makes the streamed path look
    artificially far from its bound. Returns (MB/s, ms/batch)."""
    sum_fn = jax.jit(lambda x: jnp.sum(x, dtype=jnp.uint32))
    slices = [np.ascontiguousarray(images[i * BATCH:(i + 1) * BATCH])
              for i in range(min(k, images.shape[0] // BATCH))]
    np.asarray(sum_fn(jax.device_put(slices[0])))  # compile + first-exec
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = None
        for s_ in slices:
            s = sum_fn(jax.device_put(s_))
            tot = s if tot is None else tot + s
        np.asarray(tot)
        best = min(best, (time.perf_counter() - t0) / len(slices))
    return BATCH_BYTES / best / 1e6, best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import inference, models
    from ursabench_tpu.data.arrays import DataSplit
    from ursabench_tpu.data.native import HostStreamingSplit
    from ursabench_tpu.data.transforms import ImageSpec
    from ursabench_tpu.profiling.hw import device_peaks, train_step_cost, xla_cost
    from ursabench_tpu.util import enable_compilation_cache, softmax_probs

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

    def run_epochs(split, label, epochs, bound_sps=None):
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
        if bound_sps:
            row["pct_of_bound"] = round(sps / bound_sps * 100, 1)
        out[label] = row
        print(label, row, flush=True)
        return s, sps

    # 1. chip ceiling: the whole (uint8) train set lives in HBM (~308 MB)
    hbm_split = DataSplit(images, labels, batch_size=BATCH, spec=spec)
    _, hbm_sps = run_epochs(hbm_split, "in_hbm_epoch", epochs=3)

    # 2. streamed-path decomposition: the three pipeline stages, separately
    gather_ms = measure_host_gather(images, labels)
    h2d_mbps, h2d_ms = measure_h2d_ceiling(jax, jnp, images)
    step_ms = 1e3 / hbm_sps
    bound_ms = max(gather_ms, h2d_ms, step_ms)  # stages overlap; max binds
    bound_sps = 1e3 / bound_ms
    binding = {gather_ms: "host_gather", h2d_ms: "h2d_transport",
               step_ms: "device_step"}[bound_ms]
    out["stream_decomposition"] = {
        "host_gather_ms_per_batch": round(gather_ms, 2),
        "h2d_ms_per_batch": round(h2d_ms, 2),
        "h2d_mb_per_sec": round(h2d_mbps, 1),
        "device_step_ms": round(step_ms, 2),
        "binding_stage": binding,
        "bound_steps_per_sec": round(bound_sps, 2),
        "note": "h2d measured on distinct real dataset slices; the tunnel "
                "rate is data-entropy-dependent (compressible data ships "
                "faster), so this bound is for THIS data, uniform-random = "
                "worst case",
    }
    print("stream_decomposition", out["stream_decomposition"], flush=True)

    # 3. beyond-HBM: per-batch streaming (C++ prefetch + staging ring +
    # double-buffered device_put), then chunked stage-to-HBM streaming.
    # The tunnel's wire rate DRIFTS run to run (measured 20-45 MB/s over
    # one session), so the ceiling is re-measured immediately after the
    # streamed runs and pct_of_bound uses the mean of the two readings.
    stream = HostStreamingSplit(images, labels, batch_size=BATCH, spec=spec)
    sampler, stream_sps = run_epochs(stream, "streamed_epoch", epochs=2,
                                     bound_sps=bound_sps)
    chunked = HostStreamingSplit(images, labels, batch_size=BATCH, spec=spec,
                                 chunk_batches=CHUNK)
    _, chunk_sps = run_epochs(chunked, "streamed_epoch_chunked", epochs=2,
                              bound_sps=bound_sps)
    out["streamed_epoch_chunked"]["chunk_batches"] = CHUNK
    h2d_mbps2, h2d_ms2 = measure_h2d_ceiling(jax, jnp, images)
    bound2_ms = max(gather_ms, (h2d_ms + h2d_ms2) / 2, step_ms)
    bound2 = 1e3 / bound2_ms
    out["stream_decomposition"]["h2d_mb_per_sec_after"] = round(h2d_mbps2, 1)
    out["stream_decomposition"]["bound_steps_per_sec_mean"] = round(bound2, 2)
    out["streamed_epoch"]["pct_of_mean_bound"] = round(
        100 * stream_sps / bound2, 1)
    out["streamed_epoch_chunked"]["pct_of_mean_bound"] = round(
        100 * chunk_sps / bound2, 1)
    print("ceiling re-read", {"h2d_mb_per_sec_after": round(h2d_mbps2, 1),
                              "bound_mean": round(bound2, 2)}, flush=True)

    # 4. BMA eval of the harvested ensemble, DEVICE-AMORTIZED: K whole
    # test-set sweeps inside one program, one dependent fetch (bench.py's
    # BMA methodology — a per-batch Python loop reads the tunnel's RPC
    # pipelining, not the chip).
    ens = sampler.sample(num_samples=2)
    test_split = DataSplit(test_images, test_labels, batch_size=BATCH,
                           spec=spec)
    batches = [b for b in test_split.batches() if b[0].shape[0] == BATCH]
    xs = jnp.stack([x for x, _ in batches])  # (nb, bs, H, W, C) normalized

    def bma_probs(params, bstats, x):
        def one(p, b):
            return ens.module.apply({"params": p, "batch_stats": b}, x,
                                    train=False)

        return softmax_probs(jax.vmap(one)(params, bstats)).mean(0)

    bma_flops_batch = xla_cost(
        jax.jit(bma_probs), ens.params, ens.batch_stats, batches[0][0]
    )["flops"]
    BMA_SWEEPS = 24  # ~24x4 fwd-batches per fetch: the ~28 ms RPC term <3%

    @jax.jit
    def bma_sweeps(params, bstats, xs):
        def sweep(carry, _):
            def body(c, x):
                return c + bma_probs(params, bstats, x).sum(), None

            c, _ = jax.lax.scan(body, carry, xs)
            return c, None

        o, _ = jax.lax.scan(sweep, jnp.float32(0.0), None, length=BMA_SWEEPS)
        return o

    np.asarray(bma_sweeps(ens.params, ens.batch_stats, xs))  # compile+first
    best_imgs = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(bma_sweeps(ens.params, ens.batch_stats, xs))
        best_imgs = max(best_imgs, BMA_SWEEPS * len(batches) * BATCH
                        / (time.perf_counter() - t0))
    row = {"members": ens.num_members,
           "images_per_sec": round(best_imgs, 1),
           "achieved_tflops": round(best_imgs / BATCH * bma_flops_batch / 1e12,
                                    2),
           "method": f"device-amortized ({BMA_SWEEPS} test-set sweeps/fetch)"}
    if peak:
        row["mfu_pct_of_bf16_peak"] = round(
            best_imgs / BATCH * bma_flops_batch / peak * 100, 1)
    out["bma_eval"] = row
    print("bma_eval", row, flush=True)

    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
