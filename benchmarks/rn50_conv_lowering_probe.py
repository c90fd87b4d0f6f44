"""A/B probe: TPU-friendly lowerings for the convs rn50_conv_decomp.py
flagged below ~30% MFU (VERDICT r4 item 2, mitigation half).

Two candidate rewrites, both mathematically exact:

1. **1x1 conv -> dot**: a 1x1 stride-1 conv IS a matmul
   (N*H*W, Cin) @ (Cin, Cout); stride-2 is a ::2 slice then the matmul
   (top-left tap, exactly torch/XLA's stride-2 1x1 semantics). The decomp
   shows XLA's conv lowering for these shapes at 56^2 with a 256-wide side
   runs at 7-23% MFU while the identical FLOPs as a plain dot should tile
   cleanly onto the MXU.

2. **stem space-to-depth**: the 7x7/2 stem has Cin=3 — a 3-deep
   contraction that wastes the 128-lane MXU dimension (fwd 34%, wgrad
   10.6% MFU). The classic TPU rewrite: 2x2 space-to-depth the input to
   (112,112,12) and convolve with the front-zero-padded kernel reshaped to
   4x4x12x64, stride 1, padding (2,1) — identical outputs, 4x deeper
   contraction. (Public technique from the MLPerf TPU ResNet playbook.)

Each form is timed with the SAME dynamic-K harness as the decomp
(rn50_common.make_dynamic_k_timer) so the A/B is apples-to-apples; the
conv-form baseline is read from assets/rn50_conv_decomp.json.

Reference anchor: /root/reference/URSABench/trtprof/to_onnx.py:37 (rn50 is
the reference's flagship engine target).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/rn50_conv_lowering_probe.py
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DECOMP = os.path.join(HERE, "..", "assets", "rn50_conv_decomp.json")
ASSET = os.path.join(HERE, "..", "assets", "rn50_conv_lowering_probe.json")

BATCH = 128
REPS = 2

# every 1x1 conv shape in torchvision rn50 at 224^2 (name matches the
# decomp asset's rows so the A/B joins on it)
ONE_BY_ONE = [
    ("l1_1x1_in", 56, 64, 64, 1),
    ("l1_1x1_out", 56, 64, 256, 1),
    ("l1_down", 56, 64, 256, 1),
    ("l1_1x1_in256", 56, 256, 64, 1),
    ("l2_1x1_in", 56, 256, 128, 1),
    ("l2_down_s2", 56, 256, 512, 2),
    ("l2_1x1_in512", 28, 512, 128, 1),
    ("l2_1x1_out", 28, 128, 512, 1),
    ("l3_1x1_in", 28, 512, 256, 1),
    ("l3_down_s2", 28, 512, 1024, 2),
    ("l3_1x1_in1024", 14, 1024, 256, 1),
    ("l3_1x1_out", 14, 256, 1024, 1),
    ("l4_1x1_in", 14, 1024, 512, 1),
    ("l4_down_s2", 14, 1024, 2048, 2),
    ("l4_1x1_in2048", 7, 2048, 512, 1),
    ("l4_1x1_out", 7, 512, 2048, 1),
]


def conv1x1_dot(x, w, stride):
    """Exact 1x1-conv rewrite: optional top-left-tap slice, then a matmul
    on the flattened pixels. w is the conv kernel (1,1,Cin,Cout)."""
    import jax.numpy as jnp

    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    n, h, ww, cin = x.shape
    y = jnp.dot(x.reshape(n * h * ww, cin), w.reshape(cin, -1))
    return y.reshape(n, h, ww, -1)


def stem_s2d(x, w):
    """Exact 7x7/2 pad-3 stem rewrite on 2x2 space-to-depth input.

    Derivation: y[i,j] = sum_u x[2i+u-3] w[u]. Writing u-3 = 2t+r
    (r in {0,1}) gives taps at s2d pixel i+t, channel r with
    t in {-2..1} — a 4x4 stride-1 kernel, padding (2,1), where
    w4[k, r] = w[2k+r-1] (zero when out of range, i.e. one zero row/col
    padded at the FRONT of each spatial dim)."""
    import jax.numpy as jnp
    from jax import lax

    n, h, ww, c = x.shape
    xs = x.reshape(n, h // 2, 2, ww // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, ww // 2, 4 * c)
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w4 = w8.reshape(4, 2, 4, 2, c, -1).transpose(0, 2, 1, 3, 4, 5)
    w4 = w4.reshape(4, 4, 4 * c, -1)
    return lax.conv_general_dilated(
        xs, w4, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    import jax
    import jax.numpy as jnp

    from rn50_common import make_dynamic_k_timer
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    peak, _ = device_peaks()
    timed = make_dynamic_k_timer(REPS)
    dn = ("NHWC", "HWIO", "NHWC")

    with open(DECOMP) as f:
        base = {r["shape"]: r for r in json.load(f)["rows"]}

    key = jax.random.PRNGKey(0)
    out = {"device": str(jax.devices()[0]),
           "model": "torchvision resnet50 224^2 bs128 bf16 lowering A/B",
           "rows": []}
    t00 = time.perf_counter()

    # --- correctness gate first (CPU-cheap shapes, f32, vs lax.conv) ---
    xc = jax.random.normal(key, (2, 8, 8, 5), jnp.float32)
    wc = jax.random.normal(key, (1, 1, 5, 7), jnp.float32)
    for s in (1, 2):
        ref = jax.lax.conv_general_dilated(xc, wc, (s, s), [(0, 0)] * 2,
                                           dimension_numbers=dn)
        np.testing.assert_allclose(conv1x1_dot(xc, wc, s), ref, rtol=1e-5)
    xs7 = jax.random.normal(key, (2, 16, 16, 3), jnp.float32)
    ws7 = jax.random.normal(key, (7, 7, 3, 4), jnp.float32)
    ref = jax.lax.conv_general_dilated(xs7, ws7, (2, 2), [(3, 3)] * 2,
                                       dimension_numbers=dn)
    np.testing.assert_allclose(stem_s2d(xs7, ws7), ref, rtol=2e-4, atol=1e-4)
    print("exactness gates passed", flush=True)

    for (name, h, cin, cout, stride) in ONE_BY_ONE:
        ho = -(-h // stride)
        fl = 2.0 * BATCH * ho * ho * cin * cout
        ideal_s = fl / peak if peak else 1e-4
        x = jax.random.normal(key, (BATCH, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(key, (1, 1, cin, cout), jnp.bfloat16)
        g = jax.random.normal(key, (BATCH, ho, ho, cout), jnp.bfloat16)

        t_f = timed(lambda c, w_: conv1x1_dot(c, w_, stride), x, (w,),
                    ideal_s)
        t_d = timed(
            lambda c, w_, x0: jax.vjp(
                lambda xx: conv1x1_dot(xx, w_, stride), x0)[1](c)[0],
            g, (w, x), ideal_s)
        t_w = timed(
            lambda c, x_, w0: jax.vjp(
                lambda ww: conv1x1_dot(x_, ww, stride), w0)[1](c)[0],
            g, (x, w), ideal_s)
        row = {"shape": name, "HxW": h, "Cin": cin, "Cout": cout,
               "stride": stride, "form": "dot"}
        for lbl, t in (("fwd", t_f), ("dgrad", t_d), ("wgrad", t_w)):
            row[f"{lbl}_us"] = round(t * 1e6, 1)
            if peak:
                row[f"{lbl}_mfu_pct"] = round(fl / t / peak * 100, 1)
            b = base.get(name, {}).get(f"{lbl}_us")
            if b:
                row[f"{lbl}_speedup_vs_conv"] = round(b / (t * 1e6), 2)
        out["rows"].append(row)
        print(f"[{time.perf_counter()-t00:6.0f}s]", row, flush=True)

    # --- stem: conv form vs space-to-depth form (dgrad not needed in
    # training: nothing upstream of the stem has parameters) ---
    fl = 2.0 * BATCH * 112 * 112 * 49 * 3 * 64
    fl_s2d = 2.0 * BATCH * 112 * 112 * 16 * 12 * 64
    x = jax.random.normal(key, (BATCH, 224, 224, 3), jnp.bfloat16)
    w = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16)
    g = jax.random.normal(key, (BATCH, 112, 112, 64), jnp.bfloat16)
    t_f = timed(lambda c, w_: stem_s2d(c, w_), x, (w,), fl_s2d / peak)
    t_w = timed(
        lambda c, x_, w0: jax.vjp(lambda ww: stem_s2d(x_, ww), w0)[1](c)[0],
        g, (x, w), fl_s2d / peak)
    row = {"shape": "stem7x7s2", "form": "space_to_depth",
           "fwd_us": round(t_f * 1e6, 1),
           "fwd_mfu_pct": round(fl / t_f / peak * 100, 1),
           "wgrad_us": round(t_w * 1e6, 1),
           "wgrad_mfu_pct": round(fl / t_w / peak * 100, 1),
           "note": "MFU vs the 7x7 form's algorithmic flops; the s2d "
                   "program itself does 1.306x that",
           "fwd_speedup_vs_conv": round(
               base["stem7x7s2"]["fwd_us"] / (t_f * 1e6), 2),
           "wgrad_speedup_vs_conv": round(
               base["stem7x7s2"]["wgrad_us"] / (t_w * 1e6), 2)}
    out["rows"].append(row)
    print(f"[{time.perf_counter()-t00:6.0f}s]", row, flush=True)

    # projected whole-step conv time if every 1x1 takes min(conv, dot)
    # and the stem takes min(conv, s2d) — stem dgrad excluded (DCE'd in
    # training: no parameters upstream of the stem).
    counts = {r["shape"]: r["count"] for r in base.values()}
    tot_before = tot_after = 0.0
    probe = {r["shape"]: r for r in out["rows"]}
    for nm, r in base.items():
        cnt = counts[nm]
        for lbl in ("fwd", "dgrad", "wgrad"):
            if nm == "stem7x7s2" and lbl == "dgrad":
                continue
            b = r[f"{lbl}_us"]
            a = min(b, probe.get(nm, {}).get(f"{lbl}_us", b))
            tot_before += b * cnt
            tot_after += a * cnt
    out["projected_conv_ms"] = {"before": round(tot_before / 1e3, 2),
                                "after": round(tot_after / 1e3, 2),
                                "note": "per-step conv time, stem dgrad "
                                        "excluded; min(conv, rewrite) per op"}
    print("projected", out["projected_conv_ms"], flush=True)
    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["projected_conv_ms"]))


if __name__ == "__main__":
    main()
