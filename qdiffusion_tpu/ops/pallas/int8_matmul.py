"""Pallas TPU kernel: tiled int8 x int8 -> int32 matmul with the FULL
fused dequantizing epilogue of the integer engine.

The deployed integer path (ops/int8.py) computes, per output channel o:

    y = A[o] * (x_c . w_c) + Bc[o] * S(x_c) + C[o]

where S(x_c) is the per-row sum of the recentred activations (the
asymmetric-zero-point correction). XLA runs that as a matmul plus TWO
extra elementwise/reduce passes over HBM. This kernel fuses everything:
MXU-aligned tiles (multiples of 32x128 for int8 operands), K-loop
accumulation of both the int32 dot AND the f32 row-sum in VMEM scratch,
and the dequant epilogue applied while the tile is still in VMEM — one
HBM write of the final bf16/f32 result.

Measured on v5e (4096^3): ~101 TOPs vs ~96 TOPs for XLA's int8 dot and
~80-104 TFLOPs bf16 — the MXU int8 path on this stack runs at bf16 rate
for both, so the kernel's value is the fused epilogue and layout control,
not raw matmul throughput (docs/PERF_NOTES.md). It serves int8_dense and
the attention matmuls; convolutions stay on XLA's conv-native int8 path
(an HBM im2col would read 3x3 patches at 9x amplification — measured
loser).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(x_ref, w_ref, scale_a_ref, scale_s_ref, const_ref, o_ref,
            acc_ref, s_ref, *, out_dtype):
    """Grid (i, j, k): M/N parallel, K sequential (accumulates dot + S)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    x = x_ref[:]
    acc_ref[:] += jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)
    s_ref[:] += jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # fused dequant epilogue: y = A[o]*acc + Bc[o]*S(x) + C[o]
        y = (acc_ref[:].astype(jnp.float32) * scale_a_ref[:]
             + s_ref[:] * scale_s_ref[:]
             + const_ref[:])
        o_ref[:] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "tile_k",
                                             "out_dtype", "interpret"))
def int8_matmul_dequant(
    x_c: Array,
    w_c: Array,
    scale_a: Array,
    const: Array,
    scale_s: Array | None = None,
    *,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """(M,K) int8 . (K,N) int8 -> (M,N) out_dtype, full epilogue fused.

    scale_a, scale_s, const: (N,) f32 per-out-channel dequant scale, the
    Bc row-sum correction scale, and the additive constant (ops/int8.py
    epilogue folding; pass scale_s=None/zeros for symmetric weights).
    Shapes must be multiples of the tile sizes (pad at the caller —
    zero-padding K is exact: it adds nothing to the dot or to S)."""
    M, K = x_c.shape
    K2, N = w_c.shape
    assert K == K2
    assert M % tile_m == 0 and N % tile_n == 0 and K % tile_k == 0, (
        f"{(M, K, N)} not aligned to tiles {(tile_m, tile_k, tile_n)}")
    if scale_s is None:
        scale_s = jnp.zeros_like(scale_a)

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
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.int32),
                        pltpu.VMEM((tile_m, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(x_c, w_c, scale_a.reshape(1, -1).astype(jnp.float32),
      scale_s.reshape(1, -1).astype(jnp.float32),
      const.reshape(1, -1).astype(jnp.float32))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def int8_dense_pallas(x_c: Array, w_c: Array, scale_a: Array,
                      scale_s: Array, const: Array, *,
                      out_dtype=jnp.float32,
                      interpret: bool = False) -> Array:
    """Shape-flexible wrapper: pads (M, K, N) to tile multiples, runs the
    fused kernel, slices back. Zero padding is exact for dot and S."""
    M, K = x_c.shape
    N = w_c.shape[1]
    tile_m = 256 if M >= 256 else _round_up(max(M, 1), 32)
    tile_n = 256 if N % 256 == 0 else 128
    tile_k = 512 if K % 512 == 0 else 256 if K % 256 == 0 else 128
    Mp, Kp, Np = (_round_up(M, tile_m), _round_up(K, tile_k),
                  _round_up(N, tile_n))
    if (Mp, Kp) != (M, K):
        x_c = jnp.pad(x_c, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_c = jnp.pad(w_c, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        pad = ((0, Np - N),)
        scale_a = jnp.pad(scale_a.reshape(-1), pad)
        scale_s = jnp.pad(scale_s.reshape(-1), pad)
        const = jnp.pad(const.reshape(-1), pad)
    y = int8_matmul_dequant(x_c, w_c, scale_a, const, scale_s,
                            tile_m=tile_m, tile_n=tile_n, tile_k=tile_k,
                            out_dtype=out_dtype, interpret=interpret)
    return y[:M, :N]


# ---------------------------------------------------------------------------
# int8 WEIGHT-streaming matmul: bf16 activations x int8-in-HBM weights
# ---------------------------------------------------------------------------


def _stream_kernel(x_ref, w_ref, scale_ref, scale_s_ref, const_ref, o_ref,
                   acc_ref, s_ref, *, out_dtype):
    """Grid (i, j, k): M/N parallel, K sequential.

    The weight tile arrives as int8 straight from HBM (half the bandwidth
    of bf16) and converts to bf16 in VMEM — int8 values are exact in bf16
    — so the MXU dot runs at full bf16 rate with NO materialized
    dequantized weight in HBM (the XLA stream path's loss: it writes the
    converted weight back out; docs/PERF_NOTES.md 'Weight streaming')."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    # via int32: Mosaic has no direct int8->bf16 cast on TPU
    w = w_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    x = x_ref[:]
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    s_ref[:] += jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # w_deq = w_c*scale + shift  =>  y = scale*acc + shift*S(x) + const
        y = (acc_ref[:] * scale_ref[:]
             + s_ref[:] * scale_s_ref[:]
             + const_ref[:])
        o_ref[:] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "tile_k",
                                             "out_dtype", "interpret"))
def int8_stream_matmul(
    x: Array,
    w_c: Array,
    scale: Array,
    shift: Array,
    const: Array | None = None,
    *,
    tile_m: int = 128,
    tile_n: int = 1024,
    tile_k: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """(M, K) bf16 . (K, N) int8 -> (M, N) out_dtype.

    Dequant fused into the weight load: w_deq[k,n] = w_c[k,n]*scale[n] +
    shift[n] (deploy.stream_pack_model int8 segment), so
    y = scale[n]*(x @ w_c)[m,n] + shift[n]*S(x)[m] + const[n].
    Shapes must be tile-aligned (pad at the caller; zero x padding is
    exact for both the dot and S)."""
    M, K = x.shape
    K2, N = w_c.shape
    assert K == K2
    assert M % tile_m == 0 and N % tile_n == 0 and K % tile_k == 0, (
        f"{(M, K, N)} not aligned to tiles {(tile_m, tile_k, tile_n)}")
    if const is None:
        const = jnp.zeros((N,), jnp.float32)
    grid = (M // tile_m, N // tile_n, K // tile_k)
    return pl.pallas_call(
        functools.partial(_stream_kernel, out_dtype=out_dtype),
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
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32),
                        pltpu.VMEM((tile_m, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=2 * M * K + K * N + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_c,
      scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32),
      const.reshape(1, -1).astype(jnp.float32))


def int8_dense_stream(x: Array, w_c: Array, scale: Array, shift: Array,
                      bias: Array | None = None, *,
                      out_dtype=None, interpret: bool = False) -> Array:
    """Shape-flexible wrapper: flattens leading dims of x, pads to tile
    multiples, runs int8_stream_matmul, slices back.

    x: (..., K) activations; w_c: (K, N) int8; scale/shift: per-out-channel
    (N,) or scalar; bias: optional (N,) fused into the epilogue."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_c.shape[1]
    xm = x.reshape(-1, K)
    M = xm.shape[0]
    tile_m = 128 if M >= 128 else _round_up(max(M, 1), 16)
    # largest lane-aligned divisor of K <= 512 (384 covers the 9*128
    # patch-K of 3x3 convs over 128-multiple channel counts)
    tile_k = next((tk for tk in (512, 384, 256, 128) if K % tk == 0), 128)
    # full-N tiles when VMEM allows: w int8 (x2 double-buffer) + bf16
    # convert + acc f32 + out; dominated by tile_k*tile_n and tile_m*tile_n
    budget = 14 * 2**20

    def fits(tn):
        return tile_k * tn * 5 + tile_m * tn * 8 <= budget

    single = _round_up(N, 128)  # one tile spanning all of N (pad <= 127)
    if fits(single):
        tile_n = single
    else:
        tile_n = 128
        for cand in (2048, 1024, 512, 256):
            if fits(cand):
                tile_n = cand
                break
    Mp, Kp, Np = (_round_up(M, tile_m), _round_up(K, tile_k),
                  _round_up(N, tile_n))
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1),
                             (N,))
    shift = jnp.broadcast_to(jnp.asarray(shift, jnp.float32).reshape(-1),
                             (N,))
    if (Mp, Kp) != (M, K):
        xm = jnp.pad(xm, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_c = jnp.pad(w_c, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, ((0, Np - N),))
        shift = jnp.pad(shift, ((0, Np - N),))
        if bias is not None:
            bias = jnp.pad(bias.reshape(-1), ((0, Np - N),))
    out_dtype = out_dtype or x.dtype
    y = int8_stream_matmul(xm, w_c, scale, shift, bias,
                           tile_m=tile_m, tile_n=tile_n, tile_k=tile_k,
                           out_dtype=out_dtype, interpret=interpret)
    return y[:M, :N].reshape(*lead, N)
