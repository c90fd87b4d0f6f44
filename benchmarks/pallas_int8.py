"""Pallas TPU kernel: int8 weight-streaming matvec for batch-1 serving.

PROBE STATUS (r4): lives in benchmarks/, not the package — the
committed microbench shows plain XLA int8 dequant-dot already ties it
(assets/int8_microbench.json), so the production int8 engines
(profiling/quantize.py) ship the XLA path; this kernel is kept as the
measured evidence for that decision.

The batch-1 ensemble-serving regime is weight-traffic-bound (the premise of
the int8 engines, profiling/quantize.py). This kernel streams the int8
weight matrix through VMEM in wide row tiles (Pallas's grid pipeline
double-buffers the HBM->VMEM DMA) and feeds the MXU's native
int8 x int8 -> int32 path per tile: one byte read per weight, nothing else.

Measured (assets/int8_microbench.json, 6144x6144 on v5e, K=3000 chained
iterations so the ~28 ms tunnel RPC amortizes to <10 us): this kernel
0.0705 ms vs XLA's int8 dot at 0.0673 ms vs bf16 at 0.1143 ms — i.e. XLA
already runs the int8 matvec at ~69% of the pure-stream speed-of-light and
1.7x over bf16; the hand kernel TIES XLA rather than beating it, which
pins the remaining gap on the DMA pipeline, not on dequant/layout handling
(see benchmarks/pallas_matvec_probe{,2}.py for the elimination: MXU-dot ==
VPU-reduce, chained == unchained, and a size sweep fits an ~714 GB/s
stream + per-call RPC, not a kernel inefficiency).

Quantization scheme matches profiling/quantize.py: symmetric per-output-
channel weight scales; the activation vector is quantized per-tensor by
the caller (it is tiny — K values — and XLA fuses that into the chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_TILE_N = 512  # (512, K) int8 rows per grid step; K=6144 -> 3 MiB


def _matvec_kernel(xscale_ref, w_ref, xq_ref, scale_ref, out_ref):
    acc = jax.lax.dot_general(
        w_ref[:], xq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (TILE_N, 1) int32
    out_ref[:] = acc.astype(jnp.float32) * scale_ref[:] * xscale_ref[0]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def int8_matvec(w_q8: jnp.ndarray, scales: jnp.ndarray, x: jnp.ndarray,
                *, tile_n: int = DEFAULT_TILE_N,
                interpret: bool = False) -> jnp.ndarray:
    """y = (w_q8 * scales[:, None]) @ x computed as one weight stream.

    w_q8: (N, K) int8, symmetric per-row quantized weights (N, K multiples
    of the tile: N % tile_n == 0, K % 128 == 0 — layer widths are).
    scales: (N,) f32 per-output-channel weight scales.
    x: (K,) f32 activations; quantized per-tensor here (outside the
    kernel) exactly like the int8-mxu engine variant.
    Returns (N,) f32.
    """
    n, k = w_q8.shape
    assert n % tile_n == 0 and k % LANE == 0, (n, k, tile_n)
    ax = jnp.max(jnp.abs(x))
    x_scale = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)

    out = pl.pallas_call(
        _matvec_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k, bytes_accessed=n * k + n * 4 + k, transcendentals=0,
        ),
        interpret=interpret,
    )(
        x_scale.reshape(1).astype(jnp.float32),
        w_q8,
        xq.reshape(k, 1),
        scales.reshape(n, 1).astype(jnp.float32),
    )
    return out.reshape(n)
