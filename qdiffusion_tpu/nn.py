"""Functional neural-net primitives in TPU-native layouts.

Activations are NHWC, conv weights HWIO, dense weights (in, out) — the
layouts XLA:TPU tiles onto the MXU without transposes. The torch-checkpoint
converter (models/torch_import.py) handles OIHW/(out,in) transposition.

All functions are pure: params in, arrays out. No modules, no state.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def conv2d(x: Array, w: Array, b: Optional[Array] = None, *,
           stride: Union[int, Sequence[int]] = 1,
           padding: Union[str, int, Sequence] = "SAME",
           feature_group_count: int = 1) -> Array:
    """2D convolution, NHWC x HWIO -> NHWC."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b
    return y


def conv1d(x: Array, w: Array, b: Optional[Array] = None, *,
           stride: int = 1, padding: Union[str, int] = "SAME") -> Array:
    """1D convolution, NLC x LIO -> NLC."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b
    return y


def dense(x: Array, w: Array, b: Optional[Array] = None) -> Array:
    """Affine map over the last axis; w is (in, out)."""
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


# Master switch for the single-pass Pallas GroupNorm kernel. The kernel
# defines no VJP, so callers must additionally pass fused_ok=True only on
# non-differentiated forwards (models pass `not ctx.differentiable`, the
# same gate the flash-attention dispatch uses).
FUSED_GROUPNORM = True

# Below this channel width XLA's own GroupNorm lowering wins (measured:
# CIFAR C=128 slab 0.121 ms XLA vs 0.138 ms Pallas; SD C>=320 sites are
# 1.064x faster fused at step level — docs/PERF_NOTES.md round 3).
_FUSED_GN_MIN_C = 256


def _fused_gn_ok(x: Array, num_groups: int, fused_ok: bool) -> bool:
    if not (fused_ok and FUSED_GROUPNORM) or x.shape[-1] < _FUSED_GN_MIN_C:
        return False
    from qdiffusion_tpu.ops.pallas.groupnorm import group_norm_supported

    return group_norm_supported(x.shape, num_groups, x.dtype.itemsize)


def group_norm(x: Array, scale: Array, bias: Array, *, num_groups: int = 32,
               eps: float = 1e-6, fused_ok: bool = False) -> Array:
    """GroupNorm over NHWC (or N...C) in fp32.

    The reference keeps norms in fp32 even under half precision
    (GroupNorm32, ldm util.py:214-216); we do the same to avoid FID drift
    under bf16.
    """
    if _fused_gn_ok(x, num_groups, fused_ok):
        from qdiffusion_tpu.ops.pallas.groupnorm import fused_group_norm

        return fused_group_norm(x, scale, bias, num_groups=num_groups,
                                eps=eps)
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    c = x.shape[-1]
    g = num_groups
    spatial = x.shape[1:-1]
    xg = x.reshape(x.shape[0], *spatial, g, c // g)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(x.shape[0], *spatial, c)
    return (x * scale + bias).astype(orig_dtype)


def layer_norm(x: Array, scale: Array, bias: Array, *, eps: float = 1e-5) -> Array:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * scale + bias).astype(orig_dtype)


def group_norm_swish(x: Array, scale: Array, bias: Array, *,
                     num_groups: int = 32, eps: float = 1e-6,
                     fused_ok: bool = False) -> Array:
    """swish(group_norm(x)) — the UNet ResBlock's norm+activation pair.

    The swish deliberately stays OUTSIDE the Pallas kernel: measured at
    SD step level the in-kernel swish epilogue is ~0.5 ms SLOWER (74.26
    vs 73.70 ms) — the external swish is free (XLA fuses it into the
    following conv's input read) while in-kernel it is extra VPU work on
    the write path (docs/PERF_NOTES.md round 3).
    """
    return swish(group_norm(x, scale, bias, num_groups=num_groups, eps=eps,
                            fused_ok=fused_ok))


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


def timestep_embedding(t: Array, dim: int, *, max_period: float = 10000.0,
                       fairseq: bool = True) -> Array:
    """Sinusoidal timestep embedding.

    fairseq=True matches the DDIM lineage (freqs over half_dim-1, sin|cos;
    reference ddim/models/diffusion.py:6-24). fairseq=False matches the LDM
    lineage (freqs over half, cos|sin order handled by caller via
    `ldm_order`; reference ldm util.py:151-171 uses cos|sin).
    """
    half = dim // 2
    if fairseq:
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                        * -(math.log(max_period) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    else:
        freqs = jnp.exp(-math.log(max_period)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsample on NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool_2x(x: Array) -> Array:
    """2x2 average pool, stride 2, NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def pad_asymmetric_downsample(x: Array) -> Array:
    """(0,1,0,1) spatial zero-pad used before the stride-2 3x3 downsample conv
    (reference ddim/models/diffusion.py:67-71)."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
