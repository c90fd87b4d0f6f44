"""Probe v2: separate DMA-stream rate from fixed per-iteration overhead.

Probe v1 (assets/pallas_matvec_probe.json) showed MXU-dot and VPU-reduce
matvec kernels tie at ~0.17 ms (27% of the 819 GB/s SoL) — the compute
strategy is not the bound. Candidates left: (a) the HBM->VMEM stream
itself runs at ~220 GB/s for this pattern, (b) a fixed per-iteration cost
serialized by the output->input chain. Discriminators:

  dma_only_6144 : corner-summed tile reads, no matvec -> pure stream rate.
  vpu_3072      : quarter the bytes. Bandwidth-bound => ~t/4; fixed
                  overhead => much flatter.
  vpu_unchained : iterations independent (input = x0 + eps*i, not chained
                  through the previous output) -> cross-iteration overlap
                  allowed. If this drops toward SoL, the chain was
                  serializing a latency, not a throughput, term.

RESULT (assets/pallas_matvec_probe2.json): vpu_3072 = 0.124 ms vs
vpu_6144 = 0.164 ms — quarter the bytes, only 1.32x faster — and
unchained == chained. The fit t = a + bytes/bw gives a ~= 110 us/iter and
bw ~= 714 GB/s (87% of the v5e's published HBM peak): the kernel streams
near speed-of-light and the "fixed cost" is the ~28-33 ms device->host
RPC divided by K=300. Conclusion: amortization constants must keep
RPC/K << per-iteration time (int8_microbench.py now uses K=3000; the
latency suite sizes loop_k per model/batch the same way).

Writes assets/pallas_matvec_probe2.json.
Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/pallas_matvec_probe2.py
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 300
REPS = 5


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.mean(ts))


def _dma_kernel(i_ref, w_ref, out_ref):
    g = pl.program_id(0)
    # corner-sum forces the block DMA; whole out block stays resident
    out_ref[g, 0] = (
        jnp.sum(w_ref[:32, :128].astype(jnp.float32)) + i_ref[0].astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("tile_n",))
def dma_only(w_q8, i, *, tile_n=512):
    n, k = w_q8.shape
    grid_n = n // tile_n
    return pl.pallas_call(
        _dma_kernel,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, k), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        # full-array block (shape == overall dims), indexed by program_id
        out_specs=pl.BlockSpec((grid_n, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n, 128), jnp.float32),
    )(i.reshape(1).astype(jnp.int32), w_q8)


def _vpu_kernel(xscale_ref, w_ref, xq_ref, scale_ref, out_ref):
    prod = w_ref[:].astype(jnp.int32) * xq_ref[:].astype(jnp.int32)
    acc = jnp.sum(prod, axis=1, keepdims=True)
    out_ref[:] = acc.astype(jnp.float32) * scale_ref[:] * xscale_ref[0]


@functools.partial(jax.jit, static_argnames=("tile_n",))
def vpu_matvec(w_q8, scales, x, *, tile_n=512):
    n, k = w_q8.shape
    ax = jnp.max(jnp.abs(x))
    x_scale = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    out = pl.pallas_call(
        _vpu_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, k), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    )(
        x_scale.reshape(1).astype(jnp.float32),
        w_q8,
        xq.reshape(1, k),
        scales.reshape(n, 1).astype(jnp.float32),
    )
    return out.reshape(n)


def chain_loop(body, x0):
    def fn(*weights):
        def step(i, carry):
            xi, acc = carry
            s = jnp.sum(body(xi, i, *weights).astype(jnp.float32))
            return (x0 + jnp.float32(1e-30) * s, acc + s)

        _, acc = jax.lax.fori_loop(0, K, step, (x0, jnp.float32(0.0)))
        return acc

    return jax.jit(fn)


def unchained_loop(body, x0):
    def fn(*weights):
        def step(i, acc):
            xi = x0 + jnp.float32(1e-30) * i.astype(jnp.float32)
            return acc + jnp.sum(body(xi, i, *weights).astype(jnp.float32))

        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

    return jax.jit(fn)


def make_inputs(d):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(d, d)).astype(np.float32) / np.sqrt(d)
    amax = np.abs(w).max(axis=1)
    scales = jnp.asarray(np.maximum(amax, 1e-12) / 127.0, jnp.float32)
    w_q8 = jnp.asarray(
        np.clip(np.round(w / np.asarray(scales)[:, None]), -127, 127), jnp.int8)
    return w_q8, scales, jnp.ones((d,), jnp.float32)


def main():
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    _, hbm = device_peaks()
    out = {"device": str(jax.devices()[0])}

    q6, s6, x6 = make_inputs(6144)
    q3, s3, x3 = make_inputs(3072)

    cases = {
        "dma_only_6144": (chain_loop(lambda x, i, q: dma_only(q, i) + x[0], x6),
                          (q6,), 6144),
        "vpu_6144": (chain_loop(lambda x, i, q, s: vpu_matvec(q, s, x), x6),
                     (q6, s6), 6144),
        "vpu_3072": (chain_loop(lambda x, i, q, s: vpu_matvec(q, s, x), x3),
                     (q3, s3), 3072),
        "vpu_6144_unchained": (
            unchained_loop(lambda x, i, q, s: vpu_matvec(q, s, x), x6),
            (q6, s6), 6144),
    }
    for name, (fn, args, d) in cases.items():
        sol_ms = (d * d / hbm) * 1e3 if hbm else None
        try:
            t = timed(fn, *args)
            out[name + "_ms"] = round(t * 1e3, 4)
            out[name + "_pct_of_sol"] = (
                round(sol_ms / (t * 1e3) * 100, 1) if sol_ms else None)
        except Exception as e:  # noqa: BLE001 — probe: record and continue
            out[name + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(name, out.get(name + "_ms", out.get(name + "_error")), flush=True)

    asset = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "assets", "pallas_matvec_probe2.json"))
    with open(asset, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
