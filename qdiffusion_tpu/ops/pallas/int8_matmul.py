"""Pallas TPU kernel: tiled int8 x int8 -> int32 matmul with fused
dequantizing epilogue.

The deployed integer path (ops/int8.py) routes matmuls through XLA's int8
dot. This kernel is the hand-scheduled alternative: MXU-aligned tiles
(multiples of 32x128 for int8 operands), K-loop accumulation in an int32
VMEM scratch, and the dequant scale + per-channel corrections applied in
the epilogue while the tile is still in VMEM — one HBM write of the final
bf16/f32 result instead of int32 + a second elementwise pass.

Measured on v5e (4096^3): ~101 TOPs vs ~96 TOPs for XLA's int8 dot and
~80-104 TFLOPs bf16 — i.e. the MXU int8 path on this stack runs at bf16
rate for both, so the kernel's value is the fused epilogue and layout
control, not raw matmul throughput (see docs/ROADMAP.md).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(x_ref, w_ref, scale_a_ref, const_ref, o_ref, acc_ref,
            *, out_dtype):
    """Grid (i, j, k): M/N parallel, K arbitrary (sequential accumulate)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # fused dequant epilogue: y = A[o] * acc + C[o]
        y = (acc_ref[:].astype(jnp.float32) * scale_a_ref[:]
             + const_ref[:])
        o_ref[:] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "tile_k",
                                             "out_dtype"))
def int8_matmul_dequant(
    x_c: Array,
    w_c: Array,
    scale_a: Array,
    const: Array,
    *,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k: int = 512,
    out_dtype=jnp.float32,
) -> Array:
    """(M,K) int8 . (K,N) int8 -> (M,N) out_dtype, epilogue fused.

    scale_a, const: (N,) f32 per-out-channel dequant scale and additive
    constant (see ops/int8.py epilogue folding). Shapes must be multiples
    of the tile sizes (pad at the caller; int8 tiles are (32,128)-aligned).
    """
    M, K = x_c.shape
    K2, N = w_c.shape
    assert K == K2
    assert M % tile_m == 0 and N % tile_n == 0 and K % tile_k == 0, (
        f"{(M, K, N)} not aligned to tiles {(tile_m, tile_k, tile_n)}")

    grid = (M // tile_m, N // tile_n, K // tile_k)
    return pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 4,
            transcendentals=0),
    )(x_c, w_c, scale_a.reshape(1, -1).astype(jnp.float32),
      const.reshape(1, -1).astype(jnp.float32))
