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

VMEM bounds the reach: f32 scores take Tq*S*4 bytes (two live copies) and
K/V stay resident, double-buffered — `_pick_tile_q` shrinks the q-tile
(128 -> 64 -> 32) to fit the budget, carrying sequences to 8k tokens;
beyond that `flash_supported` fails and the caller streams via the XLA
blockwise path. Quantizer delta/zero-point ride as SMEM scalars so one
compiled kernel serves every calibration state.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, fake_quant

Array = jnp.ndarray

_VMEM_BUDGET = 15 * 1024 * 1024  # of the 16MB scoped-vmem limit on v5e


def _pick_tile_q(S: int, Dp: int, itemsize: int) -> Optional[int]:
    """Fastest q-tile fitting the scoped-VMEM limit; None when even tile
    32 does not (the caller then falls back to the streaming XLA blockwise
    path). Cost model measured against the Mosaic allocator (v5e, 16MB
    scoped vmem, round-3 sweep scripts/bench_flash_tileq.py): ONE f32
    score-tile copy is live (Mosaic reuses s for exp(s-m) — tile 512 at
    S=4096 is 8.4MB of scores and compiles; 1024 is 16.8MB and fails) and
    K/V are DOUBLE-BUFFERED by the pipeline even though their index map is
    constant across the q-tile grid dimension. Tile preference is measured,
    not monotone: per-program overhead favors big tiles at long S (512 at
    S=4096: 6.00 vs 8.53 ms for 128 at the SD CFG shape) but the biggest
    tile loses below 2k keys (S=1024: 256 beats both 128 and 512); 16k+
    keys (1024^2-image latents) exceed VMEM for every tile and fall back
    to the streaming path."""
    kv = 2 * S * Dp * itemsize
    prefs = (512, 256, 128, 64, 32) if S >= 2048 else (256, 128, 64, 32)
    for tq in prefs:
        if tq * S * 4 + 2 * kv <= _VMEM_BUDGET:
            return tq
    return None


def _fq(x, delta, inv_delta, zp, *, n_levels: int, symmetric: bool,
        always_zero: bool = False, nonneg: bool = False):
    """fake_quant grid math in f32 with scalar delta/zp, matching
    quant/affine.py::fake_quant up to division-vs-reciprocal rounding
    (x * (1/delta) instead of x / delta: per-element division costs many
    VPU cycles per lane; the <=1-ulp difference can only flip a rounding
    bucket when x/delta sits within ~1e-7 of a half-integer).

    The epilogue is VPU-bound on large score tiles, so statically-known
    structure trims op passes: `always_zero` (the post-softmax quantizer,
    quant_block.py:248-252) drops the zero-point add/sub; `nonneg`
    (softmax probabilities) drops the lower clip."""
    xi = jnp.round(x * inv_delta)
    if not always_zero:
        xi = xi + zp
    if symmetric:
        xq = jnp.clip(xi, -n_levels - 1, n_levels)
    elif nonneg and always_zero:
        xq = jnp.minimum(xi, n_levels - 1)
    else:
        xq = jnp.clip(xi, 0, n_levels - 1)
    if always_zero:
        return xq * delta
    return (xq - zp) * delta


def _kernel(scal_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
            s_valid: int, sm_cfg, bf16: bool):
    # bf16 inputs: both MXU dots run on bf16 operands with f32 accumulation,
    # exactly like the model paths (ops/attention.py einsums on native-dtype
    # operands with preferred_element_type=f32) — and at full MXU rate. f32
    # inputs (tests): everything stays f32.
    q = q_ref[0]  # (Tq, D)
    k = k_ref[0]  # (Sp, D)
    if not bf16:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Tq, Sp) f32
    if s_valid < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    # Per-element division on the (Tq, S) tile is many VPU cycles/lane;
    # normalize via the row reciprocal (Tq divisions instead of Tq*S).
    linv = 1.0 / jnp.sum(e, axis=1, keepdims=True)
    cd = jnp.bfloat16 if bf16 else jnp.float32

    # V arrives pre-quantized (hoisted to one XLA fake_quant outside the
    # kernel): the (S, D) tile is as large as the score tile, and an
    # in-kernel V epilogue would be recomputed by every q-tile program —
    # measured ~1 ms of redundant VPU work at the SD 4096-token shape.
    v = v_ref[0].astype(cd)

    if sm_cfg is None:
        # unquantized softmax: fold the normalizer into the (Tq, D) output
        # instead of the (Tq, S) tile — S/D x less epilogue work
        o = jax.lax.dot_general(
            e.astype(cd), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (o * linv).astype(o_ref.dtype)
        return
    p = e * linv
    if bf16:
        # model path rounds softmax output to the bf16 carrier BEFORE the
        # post-softmax quantizer (attention.py:36 `.astype(q.dtype)`)
        p = p.astype(jnp.bfloat16).astype(jnp.float32)
    p = _fq(p, scal_ref[0, 0], 1.0 / scal_ref[0, 0], scal_ref[0, 1],
            n_levels=sm_cfg[0], symmetric=sm_cfg[1],
            always_zero=sm_cfg[2], nonneg=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(cd), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_core(scalars: Array, q: Array, k: Array, v: Array, *,
                scale: float, sm_cfg, tile_q: int, interpret: bool) -> Array:
    """Per-shard body: (B, T, H, D)/(B, S, H, D) -> (B, T, H, D).

    Shapes here are LOCAL (post-partitioning): under a sharded jit the
    custom-partitioning wrapper below runs this on each device's B/H
    shard, so the flatten/pad/grid all see per-device sizes."""
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
    Sp = _round_up(S, 128)
    qf = jnp.pad(qf, ((0, 0), (0, Tp - T), (0, Dp - D)))
    kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, Dp - D)))
    vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, Dp - D)))

    kern = functools.partial(
        _kernel, scale=scale, s_valid=S, sm_cfg=sm_cfg,
        bf16=in_dtype == jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        grid=(B * H, Tp // tile_q),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b, i: (0, 0),
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


@functools.lru_cache(maxsize=None)
def _partitioned_flash(scale: float, sm_cfg, tile_q: int, interpret: bool):
    """custom_partitioning wrapper: the kernel is independent per (batch,
    head), so under a sharded jit GSPMD may split the custom call on B
    (data parallelism) and H (megatron-style tensor parallelism) instead
    of all-gathering the full batch onto every device (the default for
    custom calls — measured 12 all-gathers and fully replicated attention
    compute on an 8-way DP mesh without this). T/S/D stay replicated:
    each program needs every key/value row."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def impl(scalars, q, k, v):
        return _flash_core(scalars, q, k, v, scale=scale, sm_cfg=sm_cfg,
                           tile_q=tile_q, interpret=interpret)

    def bh_only(sharding, mesh):
        # keep B (dim 0) and H (dim 2) axes; replicate T/S (dim 1), D (3)
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
        # ordered by first appearance in the rule (Shardy requires sorted
        # special-factor indices)
        need_replication_factors=("m", "n", "t", "d", "s"))
    return fcp


def flash_attention(q: Array, k: Array, v: Array, *, scale: float,
                    sm_q: Optional[Tuple[dict, AffineQuantizerSpec]] = None,
                    v_q: Optional[Tuple[dict, AffineQuantizerSpec]] = None,
                    tile_q: Optional[int] = None,
                    interpret: bool = False) -> Array:
    """q: (B, T, H, D); k, v: (B, S, H, D) -> (B, T, H, D).

    Matches ops/attention.py::materializing_attention / blockwise_attention
    (same static-delta quantization of normalized probabilities and V).
    tile_q None = auto (largest tile that fits VMEM, _pick_tile_q).
    Partition-aware: shardable on batch and heads (see _partitioned_flash)."""
    S = k.shape[1]
    D = q.shape[-1]
    in_dtype = q.dtype
    if tile_q is None:
        tile_q = _pick_tile_q(_round_up(S, 128), _round_up(D, 128),
                              in_dtype.itemsize)
        if tile_q is not None:
            # don't pad short query sets up to a big tile (cross-shaped
            # calls where T < S): cap at T rounded to the 128-row MXU tile
            tile_q = min(tile_q, max(128, _round_up(q.shape[1], 128)))
        if tile_q is None:
            # no silent 128-tile fallback: a tile that doesn't fit the
            # scoped-VMEM cost model fails in Mosaic, not here — callers
            # must gate with flash_supported(q.shape, k.shape, itemsize)
            # (same cost model) and stream instead.
            raise ValueError(
                f"flash_attention: no q-tile fits VMEM for S={S}, D={D}, "
                f"dtype={in_dtype}; use the streaming/blockwise path")

    if v_q is not None:
        # hoisted V quantization: one fused XLA fake_quant over (B, S, H, D)
        # instead of a per-q-tile in-kernel epilogue (see _kernel docstring)
        v_st, v_spec = v_q
        v = fake_quant(v, v_st["delta"], v_st["zero_point"], v_spec)

    def st_scalars(pair):
        # keep as traced jnp scalars: qstate arrives as jit arguments
        if pair is None:
            return jnp.float32(0), jnp.float32(0), None
        st, spec = pair
        return (jnp.asarray(st["delta"], jnp.float32).reshape(()),
                jnp.asarray(st["zero_point"], jnp.float32).reshape(()),
                (spec.n_levels, spec.symmetric, spec.always_zero))

    sm_d, sm_z, sm_cfg = st_scalars(sm_q)
    scalars = jnp.stack([sm_d, sm_z]).reshape(1, 2)

    fn = _partitioned_flash(scale, sm_cfg, tile_q, interpret)
    return fn(scalars, q, k, v)


def flash_supported(q_shape, k_shape, itemsize: int = 2) -> bool:
    """Can some q-tile size fit the per-program VMEM budget on TPU?

    `itemsize` must be the actual q/k/v dtype itemsize — the resident K/V
    footprint doubles for f32 inputs (fp32 sim engine), so gating with the
    bf16 cost model would admit shapes whose kernel then fails in Mosaic."""
    if jax.default_backend() != "tpu":
        return False
    S = _round_up(k_shape[1], 128)
    Dp = _round_up(q_shape[-1], 128)
    return _pick_tile_q(S, Dp, itemsize) is not None
