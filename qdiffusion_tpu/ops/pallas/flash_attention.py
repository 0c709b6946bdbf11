"""Pallas flash attention with exact static-delta quantization.

The XLA blockwise path (ops/attention.py) keeps memory at O(T*Bk) but pays
a second QK^T pass so that quantization applies to fully-normalized
probabilities (the reference's semantics: a calibrated static delta on
softmax OUTPUT, qdiff/quant_block.py:149-154 — online-softmax rescaling
would quantize a different function). This kernel removes the extra pass:
each grid program holds one (Tq, S) score tile entirely in VMEM, runs the
row softmax, applies the static-delta fake-quant to the normalized
probabilities (and to V), and writes only the (Tq, D) output — ONE QK^T,
zero HBM traffic for scores.

VMEM bounds the tile: f32 scores take Tq*S*4 bytes (Tq=128, S=4096 ->
2 MB), checked by `flash_supported`. Quantizer deltas/zero-points ride as
SMEM scalars so one compiled kernel serves every calibration state.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

Array = jnp.ndarray

_VMEM_SCORE_LIMIT = 6 * 1024 * 1024  # bytes of f32 scores per program


def _fq(x, delta, zp, *, n_levels: int, symmetric: bool, carrier_bf16: bool):
    """fake_quant with scalar delta/zp, matching quant/affine.py exactly
    (incl. the bf16 carrier round-trip the model paths apply)."""
    xi = jnp.round(x / delta) + zp
    if symmetric:
        xq = jnp.clip(xi, -n_levels - 1, n_levels)
    else:
        xq = jnp.clip(xi, 0, n_levels - 1)
    y = (xq - zp) * delta
    if carrier_bf16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    return y


def _kernel(scal_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
            s_valid: int, sm_cfg, v_cfg, carrier_bf16: bool):
    q = q_ref[0].astype(jnp.float32)  # (Tq, D)
    k = k_ref[0].astype(jnp.float32)  # (Sp, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Tq, Sp)
    if s_valid < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    if sm_cfg is not None:
        p = _fq(p, scal_ref[0, 0], scal_ref[0, 1], n_levels=sm_cfg[0],
                symmetric=sm_cfg[1], carrier_bf16=carrier_bf16)
    v = v_ref[0].astype(jnp.float32)
    if v_cfg is not None:
        v = _fq(v, scal_ref[0, 2], scal_ref[0, 3], n_levels=v_cfg[0],
                symmetric=v_cfg[1], carrier_bf16=carrier_bf16)
    o_ref[0] = jnp.dot(p, v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_attention(q: Array, k: Array, v: Array, *, scale: float,
                    sm_q: Optional[Tuple[dict, AffineQuantizerSpec]] = None,
                    v_q: Optional[Tuple[dict, AffineQuantizerSpec]] = None,
                    tile_q: int = 128, interpret: bool = False) -> Array:
    """q: (B, T, H, D); k, v: (B, S, H, D) -> (B, T, H, D).

    Matches ops/attention.py::materializing_attention / blockwise_attention
    (same static-delta quantization of normalized probabilities and V)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    in_dtype = q.dtype

    def to_bhd(x, L):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, L, x.shape[-1])
        return x

    qf = to_bhd(q, T)
    kf = to_bhd(k, S)
    vf = to_bhd(v, S)

    Dp = _round_up(D, 128)
    Tp = _round_up(T, tile_q)
    Sp = _round_up(S, 128)
    qf = jnp.pad(qf, ((0, 0), (0, Tp - T), (0, Dp - D)))
    kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, Dp - D)))
    vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, Dp - D)))

    def st_scalars(pair):
        # keep as traced jnp scalars: qstate arrives as jit arguments
        if pair is None:
            return jnp.float32(0), jnp.float32(0), None
        st, spec = pair
        return (jnp.asarray(st["delta"], jnp.float32).reshape(()),
                jnp.asarray(st["zero_point"], jnp.float32).reshape(()),
                (spec.n_levels, spec.symmetric))

    sm_d, sm_z, sm_cfg = st_scalars(sm_q)
    v_d, v_z, v_cfg = st_scalars(v_q)
    scalars = jnp.stack([sm_d, sm_z, v_d, v_z]).reshape(1, 4)

    kern = functools.partial(
        _kernel, scale=scale, s_valid=S, sm_cfg=sm_cfg, v_cfg=v_cfg,
        carrier_bf16=in_dtype == jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        grid=(B * H, Tp // tile_q),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_q, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dp), in_dtype),
        interpret=interpret,
    )(scalars, qf, kf, vf)
    out = out[:, :T, :D].reshape(B, H, T, D)
    return jnp.moveaxis(out, 1, 2)


def flash_supported(q_shape, k_shape, tile_q: int = 128) -> bool:
    """Does the score tile fit the per-program VMEM budget on TPU?"""
    if jax.default_backend() != "tpu":
        return False
    S = _round_up(k_shape[1], 128)
    return tile_q * S * 4 <= _VMEM_SCORE_LIMIT
