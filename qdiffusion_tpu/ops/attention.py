"""Attention kernels: materializing and blockwise (flash-style) variants.

The reference materializes every T x T attention matrix; its only concession
to the 4096-token worst case (SD 64x64 latent self-attention) is halving the
calibration cache (`is_sm`, qdiff/utils.py:46-79) and keeping post-softmax
weights at 16 bits. Here the blockwise path never materializes the matrix:

  pass 1: row-wise (max, sum-exp) streamed over key blocks (lax.scan);
  pass 2: out += quant(exp(s - m) / l) . quant(v), streamed again.

Two passes cost one extra QK^T, in exchange for O(T * B_k) memory instead
of O(T^2) — and, crucially, the *post-softmax quantizer semantics stay
exact*: quantization applies to the fully-normalized probabilities with the
calibrated static delta, identical to the materializing path (a single-pass
online-softmax rescaling would quantize unnormalized weights, which is a
different function).

All inputs are (B, T, H, D)/(B, S, H, D); softmax statistics in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qdiffusion_tpu.quant.affine import fake_quant

Array = jnp.ndarray


def materializing_attention(q: Array, k: Array, v: Array, *, scale: float,
                            sm_q=None, v_q=None) -> Array:
    """Reference-shaped attention; sm_q/v_q: optional (state, spec) pairs."""
    w = jnp.einsum("bihd,bjhd->bhij", q, k,
                   preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(w, axis=-1).astype(q.dtype)
    if sm_q is not None:
        st, spec = sm_q
        w = fake_quant(w, st["delta"], st["zero_point"], spec)
    if v_q is not None:
        st, spec = v_q
        v = fake_quant(v, st["delta"], st["zero_point"], spec)
    return jnp.einsum("bhij,bjhd->bihd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def blockwise_attention(q: Array, k: Array, v: Array, *, scale: float,
                        sm_q=None, v_q=None, block_size: int = 512,
                        allow_pallas: bool = True) -> Array:
    """Flash-style two-pass attention with exact static-delta quantization.

    q: (B, T, H, D); k, v: (B, S, H, D). Never materializes (T, S).

    On TPU, when the score tile fits VMEM, dispatches to the single-pass
    Pallas kernel (ops/pallas/flash_attention.py) — same math, one QK^T
    instead of two and zero HBM score traffic.
    """
    if allow_pallas:
        from qdiffusion_tpu.ops.pallas.flash_attention import (
            flash_attention, flash_supported)

        if flash_supported(q.shape, k.shape, q.dtype.itemsize):
            return flash_attention(q, k, v, scale=scale, sm_q=sm_q, v_q=v_q)

        from qdiffusion_tpu.ops.pallas.flash_streaming import (
            streaming_flash_attention, streaming_supported)

        if streaming_supported(q.shape, k.shape):
            # beyond the resident-K/V VMEM budget (16k+ keys): stream K/V
            # blocks through a two-pass Pallas kernel, same exact math as
            # the lax.scan fallback below but with fused epilogues
            return streaming_flash_attention(q, k, v, scale=scale,
                                             sm_q=sm_q, v_q=v_q)
    B, T, H, D = q.shape
    S = k.shape[1]
    bs = min(block_size, S)
    n_blocks = -(-S // bs)
    pad = n_blocks * bs - S
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kb = k.reshape(B, n_blocks, bs, H, D)
    vb = v.reshape(B, n_blocks, bs, H, D)
    if pad:
        valid = jnp.arange(n_blocks * bs) < S
        valid = valid.reshape(n_blocks, bs)
    else:
        valid = jnp.ones((n_blocks, bs), bool)

    qf = q.astype(jnp.float32)

    def scores(kblk, vmask):
        s = jnp.einsum("bihd,bjhd->bhij", qf, kblk.astype(jnp.float32)) * scale
        return jnp.where(vmask[None, None, None, :], s, -jnp.inf)

    # pass 1: streaming (max, sum-exp)
    def p1(carry, inp):
        m, l = carry
        kblk, vmask = inp
        s = scores(kblk, vmask)  # (B, H, T, bs)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new[..., None]),
                                             axis=-1)
        return (m_new, l), None

    m0 = jnp.full((B, H, T), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, T), jnp.float32)
    (m, l), _ = jax.lax.scan(p1, (m0, l0),
                             (jnp.moveaxis(kb, 1, 0), valid))

    # pass 2: out += quant(p) . quant(v), p fully normalized
    def make_q(pair):
        if pair is None:
            return lambda x: x
        st, spec = pair
        return lambda x, st=st, spec=spec: fake_quant(
            x, st["delta"], st["zero_point"], spec)

    vq_fn = make_q(v_q)
    smq_fn = make_q(sm_q)

    def p2(acc, inp):
        kblk, vblk, vmask = inp
        s = scores(kblk, vmask)
        p = jnp.exp(s - m[..., None]) / l[..., None]
        p = jnp.where(vmask[None, None, None, :], p, 0.0)
        p = smq_fn(p.astype(q.dtype)).astype(jnp.float32)
        vv = vq_fn(vblk).astype(jnp.float32)
        acc = acc + jnp.einsum("bhij,bjhd->bihd", p, vv)
        return acc, None

    acc0 = jnp.zeros((B, T, H, D), jnp.float32)
    out, _ = jax.lax.scan(p2, acc0,
                          (jnp.moveaxis(kb, 1, 0), jnp.moveaxis(vb, 1, 0),
                           valid))
    return out.astype(q.dtype)
