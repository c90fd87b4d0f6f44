"""Does TVResNet50 conv-backward MFU recover with batch size?

assets/rn50_decomp.json pins the train-vs-eval MFU gap (33% vs 55-61%) on
XLA's conv-backward at 224^2 bs128. Two hypotheses distinguish themselves
at larger batch:

  (a) the filter/input-gradient convs are under-tiled at bs128 and the MXU
      fills as the batch dimension grows -> bs256 MFU rises and the
      production ImageNet operating point should move to bs256;
  (b) the backward convs run at their attainable speed for this shape and
      batch only scales the work -> per-image time flat, ceiling confirmed.

Protocol: value_and_grad of the training loss (train mode, BN mutation,
every grad leaf live — the exact fwd_bwd program of rn50_decomp.py) as K
iterations inside one jitted fori_loop, single device fetch, K sized so
the ~28 ms tunnel RPC is <3% of each window (CLAUDE.md amortization rule).
bs128 is re-measured in the same process as the cross-check against the
committed decomposition row.

Reference anchor: trtprof trains/loads torchvision resnet50
(/root/reference/URSABench/trtprof/to_onnx.py:37).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/rn50_batch_scaling.py
"""

import json
import os
import time

import numpy as np

from imagenet_train_bench import SIZE, CH, CLASSES
from rn50_common import make_fwd_bwd_k, timed_best_per_iter

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "rn50_batch_scaling.json")
)

BATCHES = (128, 256)
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import models
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
    peak, _ = device_peaks()

    out = {"device": str(jax.devices()[0]),
           "model": f"TVResNet50 {SIZE}^2/{CLASSES}-way bf16 fwd_bwd",
           "rows": {}}

    for batch in BATCHES:
        flops_step = train_step_cost(module, spec.shape, batch)["flops"]
        # ~47 ms/step at bs128 (rn50_decomp) -> K=40 gives a ~2 s window
        # (RPC 28 ms = 1.5%); halve K as the per-step time doubles
        k = max(10, int(40 * 128 / batch))
        x0 = jnp.zeros((batch,) + spec.shape, jnp.float32)
        y0 = jnp.zeros((batch,), jnp.int32)
        # the SHARED harness (rn50_common): same program as rn50_decomp's
        # committed fwd_bwd row
        best = timed_best_per_iter(make_fwd_bwd_k(module, k), k, REPS,
                                   params, bstats, x0, y0)
        row = {
            "ms": round(best * 1e3, 3),
            "images_per_sec": round(batch / best, 1),
            "loop_k": k,
        }
        if peak:
            row["mfu_pct_of_bf16_peak"] = round(
                flops_step / best / peak * 100, 1)
        out["rows"][f"bs{batch}"] = row
        print(f"bs{batch}", row, flush=True)

    b0, b1 = (out["rows"][f"bs{b}"] for b in BATCHES)
    out["per_image_speedup_bs256_vs_bs128"] = round(
        b1["images_per_sec"] / b0["images_per_sec"], 3)
    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
