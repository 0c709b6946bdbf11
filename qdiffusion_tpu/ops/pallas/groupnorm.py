"""Fused GroupNorm (+ optional swish) Pallas kernel.

One-pass GroupNorm: each grid program loads a (Bt, S, C) slab into VMEM,
computes per-group mean/var in f32, normalizes, applies the affine (and
optionally swish), and writes once.

Measured outcome (docs/PERF_NOTES.md): XLA's own GroupNorm lowering on
this v5e stack is already near its achievable bandwidth (0.121 ms vs this
kernel's 0.138 ms at the CIFAR hot shape, batch-blocked), so the deployed
engines keep the XLA path and `nn.FUSED_GROUPNORM` stays off by default.
The kernel remains as a correct, tested building block (and the pattern —
group stats via a block-diagonal mask matmul — is the one to extend if a
future stack shifts the balance).

Group statistics without lane-crossing reshapes: per-channel sums reduce
over the sublane axis (VPU-friendly), then a tiny (C, C) block-diagonal
mask matmul broadcasts each group's total back to its member channels —
one 1xCxC MXU op instead of a (C,) -> (G, C/G) relayout.

Matches nn.group_norm semantics (f32 stats, biased variance, eps inside
rsqrt; reference GroupNorm32/torch GroupNorm). Falls back to the XLA path
off-TPU or when a slab exceeds the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# one (1, S, C) slab + f32 working copy must fit comfortably in ~16MB VMEM
_VMEM_SLAB_LIMIT = 4 * 1024 * 1024  # elements of x per batch item


@functools.lru_cache(maxsize=64)
def _group_mask(c: int, groups: int) -> np.ndarray:
    """(C, C) f32 block-diagonal mask: M[i, j] = 1 iff same group."""
    cg = c // groups
    g = np.arange(c) // cg
    return (g[:, None] == g[None, :]).astype(np.float32)


def _kernel(x_ref, scale_ref, bias_ref, mask_ref, o_ref, *, eps: float,
            swish: bool, n_per_group: float):
    x = x_ref[...].astype(jnp.float32)  # (Bt, S, C)
    s = jnp.sum(x, axis=1)  # (Bt, C)
    ss = jnp.sum(x * x, axis=1)
    gs = jnp.dot(s, mask_ref[...], preferred_element_type=jnp.float32)
    gss = jnp.dot(ss, mask_ref[...], preferred_element_type=jnp.float32)
    mean = gs / n_per_group  # (Bt, C): each channel holds its group's mean
    var = gss / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = ((x - mean[:, None, :]) * inv[:, None, :] * scale_ref[...]
         + bias_ref[...])
    if swish:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_group_norm(x: Array, scale: Array, bias: Array, *,
                     num_groups: int = 32, eps: float = 1e-6,
                     swish: bool = False, interpret: bool = False) -> Array:
    """GroupNorm(+swish) over channel-last x of any rank >= 2."""
    orig_shape = x.shape
    c = orig_shape[-1]
    b = orig_shape[0]
    s = int(np.prod(orig_shape[1:-1])) if len(orig_shape) > 2 else 1
    x3 = x.reshape(b, s, c)
    mask = jnp.asarray(_group_mask(c, num_groups))
    scale = jnp.asarray(scale, jnp.float32).reshape(1, c)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, c)

    # batch-block: big slabs amortize per-program overhead; ~2MB of input
    # per program double-buffers well within VMEM (f32 working copy incl.)
    slab_elems = s * c
    bt = max(1, min(b, (1 << 20) // max(1, slab_elems)))
    while b % bt != 0:
        bt -= 1

    kern = functools.partial(_kernel, eps=eps, swish=swish,
                             n_per_group=float(s * (c // num_groups)))
    out = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(x3, scale, bias, mask)
    return out.reshape(orig_shape)


def group_norm_supported(x_shape, num_groups: int = 32) -> bool:
    """Can fused_group_norm handle this shape on the current backend?"""
    if jax.default_backend() != "tpu":
        return False
    c = x_shape[-1]
    if c % num_groups != 0:
        return False
    slab = int(np.prod(x_shape[1:]))
    return slab <= _VMEM_SLAB_LIMIT
