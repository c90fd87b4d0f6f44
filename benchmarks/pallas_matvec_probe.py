"""Probe: what bounds the batch-1 int8 weight-streaming matvec on this chip?

assets/int8_microbench.json shows every variant (XLA bf16/int8 and the
Pallas kernel) sitting ~140us above its pure-weight-traffic speed-of-light,
i.e. ~4x off. This probe separates the candidate bottlenecks with one
process (amortizing the remote first-execution penalty) and K-iteration
chained fori_loops (amortizing dispatch):

  dma_only   : same grid/BlockSpec as the kernel but the tile is only
               corner-summed -> pure HBM->VMEM pipeline rate.
  mxu_t512   : shipped kernel (benchmarks/pallas_int8.py), tile_n=512.
  mxu_t2048  : same, tile_n=2048 (fewer, bigger DMAs).
  mxu_row    : rhs as a (1, K) row vector, contracting dim 1 x dim 1
               (lane-friendly rhs layout, no (K,1) column padding).
  vpu_t512   : no MXU - upcast-to-int32 multiply + lane reduction on the
               VPU (matvec never fills the systolic array; the VPU's
               ~4 Tops is ~80x more than the stream needs).

RESULT: mxu_t512 == vpu_t512 (~0.17 ms) — compute strategy irrelevant;
dma_only hit a Pallas block-shape limit (fixed in probe v2); mxu_t2048
crashed the remote compiler. The bottleneck was resolved by probe v2
(pallas_matvec_probe2.py): a ~110 us/iteration RPC term from K=300, not
the kernel — at K=3000 the same kernels run at 65-69% of stream SoL.

Writes assets/pallas_matvec_probe.json.
Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/pallas_matvec_probe.py
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
D = 6144
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


# ---------------- dma-only floor ----------------

def _dma_kernel(i_ref, w_ref, out_ref):
    # corner-sum: forces the block DMA, negligible compute
    out_ref[0, 0] = (
        jnp.sum(w_ref[:32, :128].astype(jnp.float32)) + i_ref[0].astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("tile_n",))
def dma_only(w_q8, i, *, tile_n=512):
    n, k = w_q8.shape
    return pl.pallas_call(
        _dma_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, k), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // tile_n, 1), jnp.float32),
    )(i.reshape(1).astype(jnp.int32), w_q8)


# ---------------- mxu row-rhs variant ----------------

def _row_kernel(xscale_ref, w_ref, xq_ref, scale_ref, out_ref):
    acc = jax.lax.dot_general(
        w_ref[:], xq_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (tile_n, 1)
    out_ref[:] = acc.astype(jnp.float32) * scale_ref[:] * xscale_ref[0]


# ---------------- vpu variant ----------------

def _vpu_kernel(xscale_ref, w_ref, xq_ref, scale_ref, out_ref):
    prod = w_ref[:].astype(jnp.int32) * xq_ref[:].astype(jnp.int32)  # (tile_n, K)
    acc = jnp.sum(prod, axis=1, keepdims=True)  # (tile_n, 1) int32
    out_ref[:] = acc.astype(jnp.float32) * scale_ref[:] * xscale_ref[0]


@functools.partial(jax.jit, static_argnames=("tile_n", "kernel"))
def matvec_row(w_q8, scales, x, *, tile_n=512, kernel="mxu"):
    n, k = w_q8.shape
    ax = jnp.max(jnp.abs(x))
    x_scale = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    out = pl.pallas_call(
        _row_kernel if kernel == "mxu" else _vpu_kernel,
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
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k, bytes_accessed=n * k + n * 4 + k, transcendentals=0,
        ),
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
            y = body(xi, i, *weights)
            s = jnp.sum(y.astype(jnp.float32))
            return (x0 + jnp.float32(1e-30) * s, acc + s)

        _, acc = jax.lax.fori_loop(0, K, step, (x0, jnp.float32(0.0)))
        return acc

    return jax.jit(fn)


def main():
    from benchmarks.pallas_int8 import int8_matvec
    from ursabench_tpu.profiling.hw import device_peaks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    w = rng.normal(size=(D, D)).astype(np.float32) / np.sqrt(D)
    amax = np.abs(w).max(axis=1)
    scales = jnp.asarray(np.maximum(amax, 1e-12) / 127.0, jnp.float32)
    w_q8 = jnp.asarray(
        np.clip(np.round(w / np.asarray(scales)[:, None]), -127, 127), jnp.int8)
    x0 = jnp.ones((D,), jnp.float32)

    variants = {
        "dma_only": chain_loop(lambda x, i, q: dma_only(q, i) + x[0], x0),
        "mxu_t512": chain_loop(
            lambda x, i, q, s: int8_matvec(q, s, x, tile_n=512), x0),
        "mxu_t2048": chain_loop(
            lambda x, i, q, s: int8_matvec(q, s, x, tile_n=2048), x0),
        "mxu_row": chain_loop(
            lambda x, i, q, s: matvec_row(q, s, x, tile_n=512, kernel="mxu"), x0),
        "vpu_t512": chain_loop(
            lambda x, i, q, s: matvec_row(q, s, x, tile_n=512, kernel="vpu"), x0),
    }
    _, hbm = device_peaks()
    sol_ms = (D * D / hbm) * 1e3 if hbm else None
    out = {"device": str(jax.devices()[0]), "matrix": f"{D}x{D}",
           "speed_of_light_int8_ms": round(sol_ms, 4) if sol_ms else None}
    for name, fn in variants.items():
        args = (w_q8,) if name == "dma_only" else (w_q8, scales)
        try:
            t = timed(fn, *args)
            out[name + "_ms"] = round(t * 1e3, 4)
            out[name + "_pct_of_sol"] = (
                round(sol_ms / (t * 1e3) * 100, 1) if sol_ms else None)
        except Exception as e:  # noqa: BLE001 — probe: record and continue
            out[name + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(name, out.get(name + "_ms", out.get(name + "_error")), flush=True)

    asset = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "assets", "pallas_matvec_probe.json"))
    with open(asset, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
