"""Per-conv decomposition of TVResNet50's fwd+bwd gap (VERDICT r4 item 2).

assets/rn50_decomp.json: fwd 9.4 ms (~55% MFU) but fwd+bwd ~47 ms (33%),
i.e. the backward alone runs at ~24% MFU. This driver opens the black box:
every DISTINCT conv shape in torchvision resnet50 at 224^2 bs128 bf16 is
timed separately for forward, input-gradient (dgrad) and filter-gradient
(wgrad) — each as a dynamic-K fori_loop in one jitted program with one
dependent fetch (K re-sized so each measured window is >=1.5 s actual,
drowning the ~28 ms tunnel RPC) — with per-op MFU against the chip's bf16
peak and each shape's count-weighted contribution to the whole step. The
table names which convs run below ~30% MFU so mitigations target the real
offenders instead of folklore ("the 7x7 stem").

Reference anchor: /root/reference/URSABench/trtprof/to_onnx.py:37,96-99
(torchvision rn50 is the reference's flagship engine target).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/rn50_conv_decomp.py
"""

import json
import os
import time

import numpy as np

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "rn50_conv_decomp.json")
)

BATCH = 128
REPS = 2

# (name, H_in, Cin, Cout, k, stride, count) — every distinct conv shape in
# torchvision resnet50 at 224^2 input, with how many times it appears.
SHAPES = [
    ("stem7x7s2", 224, 3, 64, 7, 2, 1),
    ("l1_1x1_in", 56, 64, 64, 1, 1, 1),
    ("l1_3x3", 56, 64, 64, 3, 1, 3),
    ("l1_1x1_out", 56, 64, 256, 1, 1, 3),
    ("l1_down", 56, 64, 256, 1, 1, 1),
    ("l1_1x1_in256", 56, 256, 64, 1, 1, 2),
    ("l2_1x1_in", 56, 256, 128, 1, 1, 1),
    ("l2_3x3_s2", 56, 128, 128, 3, 2, 1),
    ("l2_down_s2", 56, 256, 512, 1, 2, 1),
    ("l2_1x1_in512", 28, 512, 128, 1, 1, 3),
    ("l2_3x3", 28, 128, 128, 3, 1, 3),
    ("l2_1x1_out", 28, 128, 512, 1, 1, 4),
    ("l3_1x1_in", 28, 512, 256, 1, 1, 1),
    ("l3_3x3_s2", 28, 256, 256, 3, 2, 1),
    ("l3_down_s2", 28, 512, 1024, 1, 2, 1),
    ("l3_1x1_in1024", 14, 1024, 256, 1, 1, 5),
    ("l3_3x3", 14, 256, 256, 3, 1, 5),
    ("l3_1x1_out", 14, 256, 1024, 1, 1, 6),
    ("l4_1x1_in", 14, 1024, 512, 1, 1, 1),
    ("l4_3x3_s2", 14, 512, 512, 3, 2, 1),
    ("l4_down_s2", 14, 1024, 2048, 1, 2, 1),
    ("l4_1x1_in2048", 7, 2048, 512, 1, 1, 2),
    ("l4_3x3", 7, 512, 512, 3, 1, 2),
    ("l4_1x1_out", 7, 512, 2048, 1, 1, 3),
]


def conv_flops(h, cin, cout, k, stride):
    ho = -(-h // stride)
    return 2.0 * BATCH * ho * ho * k * k * cin * cout


def main():
    import jax
    import jax.numpy as jnp

    from rn50_common import make_dynamic_k_timer
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    peak, _ = device_peaks()
    dn = ("NHWC", "HWIO", "NHWC")
    timed = make_dynamic_k_timer(REPS)

    out = {"device": str(jax.devices()[0]),
           "model": "torchvision resnet50 conv shapes, 224^2 bs128 bf16",
           "rows": []}
    key = jax.random.PRNGKey(0)
    total = {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0}
    t00 = time.perf_counter()
    for (name, h, cin, cout, k, stride, count) in SHAPES:
        fl = conv_flops(h, cin, cout, k, stride)
        ideal_s = fl / peak if peak else 1e-4
        x = jax.random.normal(key, (BATCH, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16)
        ho = -(-h // stride)
        g = jax.random.normal(key, (BATCH, ho, ho, cout), jnp.bfloat16)

        def conv(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, (stride, stride), [(k // 2, k // 2)] * 2,
                dimension_numbers=dn)

        t_f = timed(lambda c, w_: conv(c, w_), x, (w,), ideal_s)
        t_d = timed(
            lambda c, w_, x0: jax.vjp(lambda xx: conv(xx, w_), x0)[1](c)[0],
            g, (w, x), ideal_s)
        t_w = timed(
            lambda c, x_, w0: jax.vjp(lambda ww: conv(x_, ww), w0)[1](c)[0],
            g, (x, w), ideal_s)
        row = {"shape": name, "HxW": h, "Cin": cin, "Cout": cout, "k": k,
               "stride": stride, "count": count,
               "gflops": round(fl / 1e9, 1)}
        for lbl, t in (("fwd", t_f), ("dgrad", t_d), ("wgrad", t_w)):
            row[f"{lbl}_us"] = round(t * 1e6, 1)
            if peak:
                row[f"{lbl}_mfu_pct"] = round(fl / t / peak * 100, 1)
            total[lbl] += t * count
        out["rows"].append(row)
        print(f"[{time.perf_counter()-t00:6.0f}s]", row, flush=True)

    out["totals_ms"] = {k_: round(v * 1e3, 2) for k_, v in total.items()}
    out["totals_ms"]["sum"] = round(sum(total.values()) * 1e3, 2)
    print("totals", out["totals_ms"], flush=True)
    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["totals_ms"]))


if __name__ == "__main__":
    main()
