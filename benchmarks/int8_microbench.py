"""Where does int8 win on this chip? Microbenchmark for the engine design.

Isolates the three candidate inference-engine regimes at batch 1 (the
weight-streaming-bound case the latency table targets) on a single big
dense layer, away from conv/layout effects:

  bf16       : y = W_bf16 @ x                      (weights 2 B/param)
  int8-deq   : y = (W_q8.astype(bf16) * scale) @ x (weights 1 B/param,
               dequant fused into the matmul read — the quantize.py scheme)
  int8-mxu   : x quantized dynamically to int8, W_q8 stays int8,
               dot_general(int8, int8) -> int32, rescale (native int8 MXU
               throughput, 2x bf16 peak on v5e-class chips)
  int8-pallas: the same int8-mxu computation as a hand-written Pallas
               weight-streaming kernel (benchmarks/pallas_int8.py): W tiles
               pipelined HBM->VMEM, int8 MXU dot per tile

Each regime runs K iterations inside one jitted lax.fori_loop with the
bit-exact output->input chaining trick (see profiling/latency.py), so the
quotient is chip execution time. Also reports the speed-of-light time from
pure weight traffic at the device's published HBM bandwidth.

K must swamp the tunnel's ~28 ms device->host RPC round-trip: probe v2
(assets/pallas_matvec_probe2.json) showed a ~110 us/iteration floor at
K=300 across ALL variants — that is 33 ms/K of RPC, not chip time (a size
sweep fits t = RPC/K + bytes/714GB/s, i.e. the stream itself runs at ~87%
of the v5e's published HBM bandwidth). At K=3000 the RPC term is ~9 us.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/int8_microbench.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 3000
D = 6144  # W is D x D: 57M params, 113MB bf16 / 57MB int8
REPS = 3


def timed(fn, *args):
    np.asarray(fn(*args))  # compile + first-exec
    np.asarray(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.mean(ts))


def chain_loop(body, x0):
    """K serial body() applications, output chained into the next input via
    an underflowing perturbation (not compile-time foldable)."""

    def fn(*weights):
        def step(_, carry):
            xi, acc = carry
            y = body(xi, *weights)
            s = jnp.sum(y.astype(jnp.float32))
            return (x0 + jnp.float32(1e-30) * s, acc + s)

        _, acc = jax.lax.fori_loop(0, K, step, (x0, jnp.float32(0.0)))
        return acc

    return jax.jit(fn)


def main():
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (D, D), jnp.float32) / np.sqrt(D)
    x0 = jnp.ones((D, 1), jnp.float32)

    w_bf16 = w.astype(jnp.bfloat16)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    scale_bf16 = scale.astype(jnp.bfloat16)

    def body_bf16(x, w):
        return w @ x.astype(jnp.bfloat16)

    def body_deq(x, q, s):
        return (q.astype(jnp.bfloat16) * s) @ x.astype(jnp.bfloat16)

    def body_mxu(x, q, s):
        # dynamic per-tensor activation quant (one abs-max reduction)
        ax = jnp.max(jnp.abs(x))
        xs = jnp.maximum(ax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q.T, xq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # scale: per-output-channel weight scale x activation scale
        return acc.astype(jnp.float32) * (s.T.astype(jnp.float32) * xs)

    from benchmarks.pallas_int8 import int8_matvec

    # the mxu/deq variants serve W' = (q * scale).T (per-column scales of q
    # are per-row scales of q.T); hand the kernel the same contiguous view
    qT = jnp.asarray(np.asarray(w_q8).T)
    s_row = jnp.asarray(scale.reshape(-1), jnp.float32)

    def body_pallas(x, qT, s_row):
        return int8_matvec(qT, s_row, x[:, 0]).reshape(D, 1)

    t_bf16 = timed(chain_loop(body_bf16, x0), w_bf16)
    t_deq = timed(chain_loop(body_deq, x0), w_q8, scale_bf16)
    t_mxu = timed(chain_loop(body_mxu, x0), w_q8, scale)
    t_pallas = timed(chain_loop(body_pallas, x0), qT, s_row)

    _, hbm = device_peaks()
    sol_bf16 = (D * D * 2) / hbm if hbm else None
    sol_int8 = (D * D * 1) / hbm if hbm else None
    out = {
        "device": str(jax.devices()[0]),
        "matrix": f"{D}x{D}",
        "bf16_ms": round(t_bf16 * 1e3, 4),
        "int8_dequant_ms": round(t_deq * 1e3, 4),
        "int8_mxu_ms": round(t_mxu * 1e3, 4),
        "int8_pallas_ms": round(t_pallas * 1e3, 4),
        "speed_of_light_bf16_ms": round(sol_bf16 * 1e3, 4) if hbm else None,
        "speed_of_light_int8_ms": round(sol_int8 * 1e3, 4) if hbm else None,
        "int8_dequant_speedup_vs_bf16": round(t_bf16 / t_deq, 2),
        "int8_mxu_speedup_vs_bf16": round(t_bf16 / t_mxu, 2),
        "int8_pallas_speedup_vs_bf16": round(t_bf16 / t_pallas, 2),
        "int8_pallas_pct_of_stream_sol": (
            round(sol_int8 / t_pallas * 100, 1) if hbm else None),
    }
    asset = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "assets", "int8_microbench.json"))
    with open(asset, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
