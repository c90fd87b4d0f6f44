"""Second-stage probe for the 56^2 1x1-conv MFU collapse (VERDICT item 2).

rn50_conv_lowering_probe.py established that XLA canonicalizes 1x1 convs
and the equivalent dots to the SAME program (speedup 1.00 on every
stride-1 shape) — so the 7.4%-MFU ops are a dot-tiling problem, not a
conv-lowering problem. The signature: any dot that READS a ~205 MB
(401408, 256) operand runs at ~226 GB/s effective, while the same op
WRITING that tensor runs at ~883 GB/s (the HBM roofline); the op is
memory-bound either way (speed-of-light ~312 us), so the read path is
~3x off the roofline.

This probe measures, on the worst shape family:
  1. the raw read ceiling — a VPU reduction over the same 205 MB tensor;
  2. dot orientation variants (transposed output, f32 accumulator);
  3. a Pallas kernel pair (M-gridded matmul + M-accumulated wgrad) that
     streams the big operand tile-by-tile through VMEM.

If Pallas reaches the read ceiling, the model integration is a
custom-vjp 1x1 matmul for the affected shapes (56^2, wide operand).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/rn50_conv1x1_pallas_probe.py
"""

import functools
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ASSET = os.path.join(HERE, "..", "assets", "rn50_conv1x1_pallas_probe.json")

BATCH = 128
REPS = 2
TM = 4096  # M-tile: 401408 = 98 * 4096


def pallas_mm(x, w, tm=TM):
    """(M, K) @ (K, N) with the grid over M; w stays resident in VMEM.
    Built for tall-skinny dots (M ~4e5, K/N <= 512) whose XLA tiling
    reads the big operand ~3x below the HBM roofline."""
    import jax
    from jax.experimental import pallas as pl

    def kernel(x_ref, w_ref, o_ref):
        import jax.numpy as jnp

        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    m, k = x.shape
    n = w.shape[1]
    assert m % tm == 0, (m, tm)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0)),
    )(x, w)


def pallas_wgrad(x, g, tm=TM):
    """x^T @ g for (M, K) x (M, N) -> (K, N): grid over M, f32 scratch
    accumulator, one HBM write at the last step."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    n = g.shape[1]
    assert m % tm == 0, (m, tm)
    steps = m // tm

    def kernel(x_ref, g_ref, o_ref, acc_ref):
        import jax.numpy as jnp

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], g_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(i == steps - 1)
        def _flush():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, n), x.dtype),
        grid=(steps,),
        in_specs=[pl.BlockSpec((tm, k), lambda i: (i, 0)),
                  pl.BlockSpec((tm, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((k, n), lambda i: (0, 0)),
        scratch_shapes=[pltpu.VMEM((k, n), dtype=np.float32)],
    )(x, g)


def main():
    import jax
    import jax.numpy as jnp

    from rn50_common import make_dynamic_k_timer
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    peak, _ = device_peaks()
    timed = make_dynamic_k_timer(REPS)
    key = jax.random.PRNGKey(0)

    M = BATCH * 56 * 56  # 401408
    big = jax.random.normal(key, (M, 256), jnp.bfloat16)   # 205 MB
    small = jax.random.normal(key, (M, 64), jnp.bfloat16)  # 51 MB
    w_kn = jax.random.normal(key, (256, 64), jnp.bfloat16)
    fl = 2.0 * M * 256 * 64
    ideal = fl / peak
    big_mb = M * 256 * 2 / 1e6

    # correctness gates for the pallas kernels (f32 tolerance on bf16 math)
    mm = np.asarray(pallas_mm(big[:TM * 2], w_kn, tm=TM))
    ref = np.asarray(jnp.dot(big[:TM * 2], w_kn))
    np.testing.assert_allclose(mm.astype(np.float32), ref.astype(np.float32),
                               rtol=0.02, atol=0.5)
    wg = np.asarray(pallas_wgrad(big[:TM * 2], small[:TM * 2], tm=TM))
    refw = np.asarray(jax.lax.dot_general(
        big[:TM * 2], small[:TM * 2], (((0,), (0,)), ((), ()))))
    np.testing.assert_allclose(wg.astype(np.float32) / TM,
                               refw.astype(np.float32) / TM,
                               rtol=0.05, atol=0.5)
    print("pallas exactness gates passed", flush=True)

    out = {"device": str(jax.devices()[0]),
           "shape": "dot (401408,256)@(256,64) family, bf16",
           "hbm_roofline_us": round((big_mb + M * 64 * 2 / 1e6) / 0.819, 1),
           "rows": []}

    def rec(name, t, flops=fl, mb=None):
        row = {"variant": name, "us": round(t * 1e6, 1),
               "mfu_pct": round(flops / t / peak * 100, 1)}
        if mb:
            row["gb_per_sec"] = round(mb / 1e3 / t, 1)
        out["rows"].append(row)
        print(row, flush=True)

    # 1. raw read ceiling: full-tensor reduction (reads 205 MB, writes ~0)
    rec("read_ceiling_sum", timed(lambda c: jnp.sum(c, dtype=jnp.float32),
                                  big, (), big_mb / 819e3),
        flops=M * 256, mb=big_mb)

    # 2. the slow dot as XLA emits it (fwd of Cin256->Cout64)
    rec("xla_dot", timed(lambda c, w: jnp.dot(c, w), big, (w_kn,), ideal),
        mb=big_mb + M * 64 * 2 / 1e6)

    # 3. orientation: out^T = dot_general contracting the SAME big operand
    #    on dim 1, output (64, M) — no input transpose materialized
    rec("xla_dot_outT", timed(
        lambda c, w: jax.lax.dot_general(w, c, (((0,), (1,)), ((), ()))),
        big, (w_kn,), ideal), mb=big_mb + M * 64 * 2 / 1e6)

    # 4. f32 accumulator output (halves the write saving? no — doubles
    #    write bytes, but may pick a different tiling)
    rec("xla_dot_f32out", timed(
        lambda c, w: jnp.dot(c, w, preferred_element_type=jnp.float32),
        big, (w_kn,), ideal), mb=big_mb + M * 64 * 4 / 1e6)

    # 5. pallas M-gridded matmul
    rec("pallas_mm", timed(lambda c, w: pallas_mm(c, w), big, (w_kn,),
                           ideal), mb=big_mb + M * 64 * 2 / 1e6)

    # 6. wgrad pair: XLA vs pallas accumulated (x^T @ g, big read side)
    rec("xla_wgrad", timed(
        lambda c, s: jax.lax.dot_general(c, s, (((0,), (0,)), ((), ()))),
        big, (small,), ideal), mb=big_mb + M * 64 * 2 / 1e6)
    rec("pallas_wgrad", timed(lambda c, s: pallas_wgrad(c, s), big,
                              (small,), ideal),
        mb=big_mb + M * 64 * 2 / 1e6)

    # 7. the fwd direction that is ALREADY at roofline, for scale
    rec("xla_dot_write_big", timed(
        lambda c, w: jnp.dot(c, w.T), small, (w_kn,), ideal),
        mb=big_mb + M * 64 * 2 / 1e6)

    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"][-7:]))


if __name__ == "__main__":
    main()
