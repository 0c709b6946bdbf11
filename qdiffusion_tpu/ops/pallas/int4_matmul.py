"""Pallas TPU kernel: int4 (nibble-packed) weight-streaming matmul.

The 'stream' deployment engine keeps quantized weights resident in HBM
and dequantizes them on the fly inside the matmul weight load
(deploy.stream_pack_model). XLA fuses `convert(int8)*scale+shift` into
dense weight loads, but it has no representation for sub-byte types on
this stack (native jnp.int4 crashes at trace time — docs/PERF_NOTES.md),
so int8 was the streaming floor. This kernel lowers that floor to 4 bits:
weights live in HBM as one uint8 per TWO int4 values and are unpacked in
VMEM, halving weight bandwidth again — the entire win on weight-bound
(small-batch serving) shapes.

Math. A calibrated 4-bit affine weight quantizer gives, per out-channel n
(quant/affine.py grid; reference semantics qdiff/quant_layer.py:66-89):

    w_deq[k, n] = (wq[k, n] - zp[n]) * delta[n]
                = nib[k, n] * delta[n] + off[n]

with nib = wq shifted to the unsigned nibble grid [0, 15]. Therefore

    y[m, n] = sum_k x[m, k] * w_deq[k, n]
            = delta[n] * (x @ nib)[m, n] + off[n] * S(x)[m]      (*)

where S(x) is the per-row activation sum — so NO per-element dequant is
needed: the kernel does one bf16 MXU dot against the raw nibbles (0..15
are exact in bf16) plus the same per-channel epilogue as the int8 engine
kernel (int8_matmul.py). Unpacking costs two integer VPU ops per weight.

Packing layout: the K dimension is folded in half, wp[k, n] holds
nib[k, n] in the low nibble and nib[k + K/2, n] in the high nibble
(pack_int4_weight). The kernel reads the SAME x operand through two
BlockSpecs offset by K/2 blocks and accumulates both halves per grid
step, so no host-side split of x is needed.

Parity: bit-exact vs fold_weights + bf16 dense when x is bf16 (same
products, f32 accumulation; tests/test_pallas_int4.py). Measured v5e:
see docs/PERF_NOTES.md (weight-bound dense chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def pack_int4_weight(nib: Array) -> Array:
    """(K, N) nibble grid in [0,15] -> (K/2, N) uint8, K-halves packed.

    K must be even (zero-pad first; a zero x column makes pad rows inert).
    """
    K = nib.shape[0]
    assert K % 2 == 0, f"K={K} must be even"
    nib = nib.astype(jnp.uint8)
    return nib[: K // 2] | (nib[K // 2:] << 4)


def unpack_int4_weight(wp: Array) -> Array:
    """Inverse of pack_int4_weight: (K/2, N) uint8 -> (K, N) int32 nibbles."""
    w32 = wp.astype(jnp.int32)
    return jnp.concatenate([w32 & 0xF, w32 >> 4], axis=0)


def _kernel(x_lo_ref, x_hi_ref, wp_ref, scale_ref, scale_s_ref, const_ref,
            o_ref, acc_ref, s_ref, *, out_dtype):
    """Grid (i, j, k): M/N parallel, K sequential. Each k step consumes one
    (tile_m, tile_k2) tile of each x half and one packed weight tile."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    # unpack via int32 (Mosaic has no uint8->bf16 cast on TPU); the i32
    # temps bound the VMEM budget in int4_dense_stream's tile picker
    w32 = wp_ref[:].astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.bfloat16)   # nib rows [k*tile_k2 : +tile_k2)
    hi = (w32 >> 4).astype(jnp.bfloat16)    # nib rows [K/2 + same)
    x_lo = x_lo_ref[:]
    x_hi = x_hi_ref[:]
    acc_ref[:] += (jnp.dot(x_lo, lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, hi, preferred_element_type=jnp.float32))
    s_ref[:] += jnp.sum(x_lo.astype(jnp.float32)
                        + x_hi.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # (*) epilogue: y = delta[n]*acc + off[n]*S(x) + const[n]
        y = (acc_ref[:] * scale_ref[:]
             + s_ref[:] * scale_s_ref[:]
             + const_ref[:])
        o_ref[:] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "tile_k2",
                                             "out_dtype", "interpret"))
def int4_stream_matmul(
    x: Array,
    wp: Array,
    scale: Array,
    off: Array,
    const: Array | None = None,
    *,
    tile_m: int = 64,
    tile_n: int = 4096,
    tile_k2: int = 256,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """(M, K) bf16 . packed-int4 (K/2, N) -> (M, N) out_dtype.

    scale/off: (N,) f32 per-out-channel delta and nibble offset (see module
    docstring); const: optional (N,) additive term (fused bias). Shapes must
    be tile-aligned: M % tile_m == 0, N % tile_n == 0, (K/2) % tile_k2 == 0
    (pad at the caller; zero x padding is exact for both dot and S)."""
    M, K = x.shape
    K2, N = wp.shape
    assert K == 2 * K2, (K, K2)
    assert M % tile_m == 0 and N % tile_n == 0 and K2 % tile_k2 == 0, (
        f"{(M, K2, N)} not aligned to tiles {(tile_m, tile_k2, tile_n)}")
    if const is None:
        const = jnp.zeros((N,), jnp.float32)
    nk = K2 // tile_k2
    grid = (M // tile_m, N // tile_n, nk)
    return pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            # x low-half rows: K-blocks [0, nk)
            pl.BlockSpec((tile_m, tile_k2), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            # x high-half rows: same array, K-blocks [nk, 2*nk)
            pl.BlockSpec((tile_m, tile_k2), lambda i, j, k: (i, k + nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k2, tile_n), lambda i, j, k: (k, j),
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
            bytes_accessed=2 * M * K + K2 * N + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), wp,
      scale.reshape(1, -1).astype(jnp.float32),
      off.reshape(1, -1).astype(jnp.float32),
      const.reshape(1, -1).astype(jnp.float32))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def int4_dense_stream(x: Array, wp: Array, scale: Array, off: Array,
                      bias: Array | None = None, *,
                      out_dtype=None, interpret: bool = False) -> Array:
    """Shape-flexible wrapper: flattens leading dims of x to M, pads
    (M, K/2, N) to tile multiples, runs the fused kernel, slices back.

    x: (..., K) activations (any float dtype; computed in bf16).
    wp: (K/2, N) packed nibbles; scale/off: (N,); bias: optional (N,)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    K2, N = wp.shape
    assert K == 2 * K2, (K, K2)
    xm = x.reshape(-1, K)
    M = xm.shape[0]
    tile_m = 128 if M >= 128 else _round_up(max(M, 1), 16)
    # tile_k2 is the LANE dim of the x blocks: must be a multiple of 128
    # on hardware (K2 below 128 is zero-padded up)
    tile_k2 = 256 if K2 % 256 == 0 else 128
    # Full-N tiles measured fastest (fewest grid revisits of the acc tile);
    # cap by a VMEM budget: wp + lo/hi bf16 unpack (double-buffered) + acc
    # f32 + out. ~12 bytes/packed-byte dominated by tile_k2*tile_n terms.
    budget = 14 * 2**20
    tile_n = 128
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if N % cand:
            continue
        need = tile_k2 * cand * 9 + tile_m * cand * 8
        if need <= budget:
            tile_n = cand
            break
    Mp, K2p, Np = (_round_up(M, tile_m), _round_up(K2, tile_k2),
                   _round_up(N, tile_n))
    if K2p != K2:
        # The packed layout folds K in half: weight pad rows land at
        # UNPACKED positions [K2, K2p) (low nibbles) and [K2p+K2, 2*K2p)
        # (high nibbles), so x must be padded per half, not at the tail.
        x_lo = jnp.pad(xm[:, :K2], ((0, 0), (0, K2p - K2)))
        x_hi = jnp.pad(xm[:, K2:], ((0, 0), (0, K2p - K2)))
        xm = jnp.concatenate([x_lo, x_hi], axis=1)
    if Mp != M:
        xm = jnp.pad(xm, ((0, Mp - M), (0, 0)))
    if (K2p, Np) != (K2, N):
        wp = jnp.pad(wp, ((0, K2p - K2), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale.reshape(-1), ((0, Np - N),))
        off = jnp.pad(off.reshape(-1), ((0, Np - N),))
        if bias is not None:
            bias = jnp.pad(bias.reshape(-1), ((0, Np - N),))
    out_dtype = out_dtype or x.dtype
    y = int4_stream_matmul(xm, wp, scale, off, bias,
                           tile_m=tile_m, tile_n=tile_n, tile_k2=tile_k2,
                           out_dtype=out_dtype, interpret=interpret)
    return y[:M, :N].reshape(*lead, N)
