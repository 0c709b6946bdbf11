"""Streaming (two-pass) Pallas flash attention: unbounded key length.

The resident-K/V kernel (flash_attention.py) tops out near 8k keys —
double-buffered full-S K/V plus two live f32 score-tile copies exhaust
v5e's 16MB scoped VMEM. This kernel streams K/V in blocks instead:

  pass 1: per q-tile, running (row-max, sum-exp) accumulated across key
          blocks in a revisited stats block (online softmax statistics);
  pass 2: out += fq(exp(s - m) / l) . v_block, accumulated across key
          blocks in a revisited f32 output block.

Two passes cost one extra QK^T — the price of EXACT static-delta
quantization of fully-normalized probabilities (the reference calibrates
the delta on softmax OUTPUT, qdiff/quant_block.py:149-154; single-pass
online rescaling would quantize a different function). Memory per program
is O(tile_q * block_k) regardless of S, so 16k-token sequences
(1024^2-image latents) and beyond run in Pallas instead of the slower
XLA blockwise lax.scan (ops/attention.py).

Same partitioning story as the resident kernel: a custom_partitioning
rule splits the custom call on batch/heads under sharded jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, fake_quant
from qdiffusion_tpu.ops.pallas.flash_attention import _fq, _round_up

Array = jnp.ndarray

_NEG_INF = -1e30  # avoids (-inf) - (-inf) NaNs in the running max update


def _p1_kernel(q_ref, k_ref, m_ref, l_ref, *, scale: float, s_valid: int,
               block_k: int, bf16: bool):
    """Running (max, sum-exp) per q row, accumulated across key blocks in
    the revisited (tile_q, 128) stats blocks (value broadcast over lanes)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[0] = jnp.full_like(m_ref[0], _NEG_INF)
        l_ref[0] = jnp.zeros_like(l_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    if not bf16:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (tq, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < s_valid, s, _NEG_INF)

    m_old = m_ref[0][:, 0:1]  # (tq, 1)
    l_old = l_ref[0][:, 0:1]
    m_blk = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, m_blk)
    l_new = l_old * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True)
    m_ref[0] = jnp.broadcast_to(m_new, m_ref[0].shape)
    l_ref[0] = jnp.broadcast_to(l_new, l_ref[0].shape)


def _p2_kernel(scal_ref, q_ref, k_ref, v_ref, m_ref, l_ref, o_ref, *,
               scale: float, s_valid: int, block_k: int, sm_cfg, bf16: bool):
    """out += quant(p) . v_block with p fully normalized via pass-1 stats."""
    j = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    if not bf16:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < s_valid, s, _NEG_INF)

    m = m_ref[0][:, 0:1]
    linv = 1.0 / l_ref[0][:, 0:1]
    p = jnp.exp(s - m) * linv  # normalized probabilities for this block
    if bf16:
        # model path rounds softmax output to bf16 BEFORE the post-softmax
        # quantizer (ops/attention.py:117 in the XLA blockwise pass 2)
        p = p.astype(jnp.bfloat16).astype(jnp.float32)
    if sm_cfg is not None:
        p = _fq(p, scal_ref[0, 0], 1.0 / scal_ref[0, 0], scal_ref[0, 1],
                n_levels=sm_cfg[0], symmetric=sm_cfg[1],
                always_zero=sm_cfg[2], nonneg=True)
    cd = jnp.bfloat16 if bf16 else jnp.float32
    v = v_ref[0].astype(cd)
    contrib = jax.lax.dot_general(
        p.astype(cd), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _first():
        o_ref[0] = contrib

    @pl.when(j > 0)
    def _rest():
        o_ref[0] = o_ref[0] + contrib


def _stream_core(scalars: Array, q: Array, k: Array, v: Array, *,
                 scale: float, sm_cfg, tile_q: int, block_k: int,
                 interpret: bool, vmem_limit: int = 0) -> Array:
    """Per-shard body: (B, T, H, D)/(B, S, H, D) -> (B, T, H, D)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    in_dtype = q.dtype

    def to_bhd(x, L):
        return jnp.moveaxis(x, 2, 1).reshape(B * H, L, x.shape[-1])

    qf = to_bhd(q, T)
    kf = to_bhd(k, S)
    vf = to_bhd(v, S)

    Dp = _round_up(D, 128)
    Tp = _round_up(T, tile_q)
    Sp = _round_up(S, block_k)
    qf = jnp.pad(qf, ((0, 0), (0, Tp - T), (0, Dp - D)))
    kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, Dp - D)))
    vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, Dp - D)))

    BH = B * H
    grid = (BH, Tp // tile_q, Sp // block_k)
    bf16 = in_dtype == jnp.bfloat16

    q_spec = pl.BlockSpec((1, tile_q, Dp), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, tile_q, 128), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)

    # vmem_limit: raise Mosaic's scoped-VMEM cap (v5e default ~16MB) so
    # larger K/V blocks can double-buffer — the block_k>1024 experiment
    # (docs/PERF_NOTES.md "Streaming flash reach")
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
               if vmem_limit else None)
    m_arr, l_arr = pl.pallas_call(
        functools.partial(_p1_kernel, scale=scale, s_valid=S,
                          block_k=block_k, bf16=bf16),
        grid=grid,
        in_specs=[q_spec, kv_spec],
        out_specs=[stat_spec, stat_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, Tp, 128), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Tp, 128), jnp.float32)],
        compiler_params=cparams,
        interpret=interpret,
    )(qf, kf)

    out = pl.pallas_call(
        functools.partial(_p2_kernel, scale=scale, s_valid=S,
                          block_k=block_k, sm_cfg=sm_cfg, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            q_spec, kv_spec, kv_spec, stat_spec, stat_spec,
        ],
        out_specs=pl.BlockSpec((1, tile_q, Dp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tp, Dp), jnp.float32),
        compiler_params=cparams,
        interpret=interpret,
    )(scalars, qf, kf, vf, m_arr, l_arr)
    out = out.astype(in_dtype)[:, :T, :D].reshape(B, H, T, D)
    return jnp.moveaxis(out, 1, 2)


@functools.lru_cache(maxsize=None)
def _partitioned_stream(scale: float, sm_cfg, tile_q: int, block_k: int,
                        interpret: bool, vmem_limit: int = 0):
    """Same batch/head partitioning rule as the resident kernel
    (flash_attention.py::_partitioned_flash)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def impl(scalars, q, k, v):
        return _stream_core(scalars, q, k, v, scale=scale, sm_cfg=sm_cfg,
                            tile_q=tile_q, block_k=block_k,
                            interpret=interpret, vmem_limit=vmem_limit)

    def bh_only(sharding, mesh):
        spec = getattr(sharding, "spec", None)
        if spec is None:
            return NamedSharding(mesh, PartitionSpec())
        b = spec[0] if len(spec) > 0 else None
        h = spec[2] if len(spec) > 2 else None
        return NamedSharding(mesh, PartitionSpec(b, None, h, None))

    def infer_sharding(mesh, arg_shapes, result_shape):
        return bh_only(arg_shapes[1].sharding, mesh)

    def partition(mesh, arg_shapes, result_shape):
        qkv = bh_only(arg_shapes[1].sharding, mesh)
        repl = NamedSharding(mesh, PartitionSpec(None, None))
        return mesh, impl, qkv, (repl, qkv, qkv, qkv)

    fcp = custom_partitioning(impl)
    fcp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="m n, b t h d, b s h d, b s h d -> b t h d",
        need_replication_factors=("m", "n", "t", "d", "s"))
    return fcp


def streaming_flash_attention(
        q: Array, k: Array, v: Array, *, scale: float,
        sm_q: Optional[Tuple[dict, AffineQuantizerSpec]] = None,
        v_q: Optional[Tuple[dict, AffineQuantizerSpec]] = None,
        tile_q: int = 128, block_k: int = 1024,
        interpret: bool = False, vmem_limit: int = 0) -> Array:
    """q: (B, T, H, D); k, v: (B, S, H, D) -> (B, T, H, D); any S.

    Same math as ops/attention.py::blockwise_attention (exact static-delta
    quantization of normalized probabilities and V; two QK^T passes)."""
    if v_q is not None:
        v_st, v_spec = v_q
        v = fake_quant(v, v_st["delta"], v_st["zero_point"], v_spec)

    def st_scalars(pair):
        if pair is None:
            return jnp.float32(0), jnp.float32(0), None
        st, spec = pair
        return (jnp.asarray(st["delta"], jnp.float32).reshape(()),
                jnp.asarray(st["zero_point"], jnp.float32).reshape(()),
                (spec.n_levels, spec.symmetric, spec.always_zero))

    sm_d, sm_z, sm_cfg = st_scalars(sm_q)
    scalars = jnp.stack([sm_d, sm_z]).reshape(1, 2)

    block_k = min(block_k, _round_up(k.shape[1], 128))
    fn = _partitioned_stream(scale, sm_cfg, tile_q, block_k, interpret,
                             vmem_limit)
    return fn(scalars, q, k, v)


def streaming_supported(q_shape, k_shape) -> bool:
    """The streaming kernel's VMEM footprint is S-independent."""
    return jax.default_backend() == "tpu"
