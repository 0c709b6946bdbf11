"""Fused GroupNorm (+ optional swish) Pallas kernel.

One-pass GroupNorm: each grid program holds a (Bt, S, C) slab resident
in VMEM, accumulates per-group mean/var in f32 over S-chunks, then
normalizes + applies the affine (optionally swish) chunk-by-chunk and
writes once — one HBM read and one write total, vs XLA's two-pass
lowering.

Measured outcome (docs/PERF_NOTES.md round 3): at the SD UNet's shapes
(C >= 320) the kernel beats XLA's lowering at step level — 78.4 ->
73.7 ms on the full CFG step (1.064x) — so `nn.FUSED_GROUPNORM` defaults
ON, gated to C >= 256 (`nn._FUSED_GN_MIN_C`): at the CIFAR hot shape
(C=128) XLA's own lowering still wins (0.121 vs 0.138 ms). The kernel
defines no VJP; models pass `fused_ok=not ctx.differentiable` so
reconstruction/Fisher forwards keep the XLA path.

Group statistics without lane-crossing reshapes: per-channel sums reduce
over the sublane axis (VPU-friendly), then a factored one-hot matmul
pair — reduce (C, G), broadcast back (G, C) — yields each channel its
group's totals without a (C,)->(G, C/G) relayout.

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


@functools.lru_cache(maxsize=64)
def _group_onehot(c: int, groups: int) -> np.ndarray:
    """(C, G) f32 one-hot: R[i, g] = 1 iff channel i is in group g.

    Kept factored (reduce C->G, broadcast G->C with its transpose) rather
    than the fused (C, C) block-diagonal mask: at the UNet's concat sites
    (C=2560) a C^2 f32 mask is 26 MB — past the 16 MB scoped-VMEM limit
    on its own — while the factored pair is 2*C*G*4 = 650 KB.
    """
    cg = c // groups
    g = np.arange(c) // cg
    return (g[:, None] == np.arange(groups)[None, :]).astype(np.float32)


def _kernel(x_ref, scale_ref, bias_ref, reduce_ref, bcast_ref, o_ref, *,
            eps: float, swish: bool, n_per_group: float, chunk: int):
    """Two chunked sweeps over the resident (Bt, S, C) block.

    A whole-slab f32 working copy plus its x*x temporary is what blew the
    16 MB scoped-VMEM budget at the UNet's wide sites (1024x1920 slab:
    2 x 7.9 MB) — so the stats and the normalize/write each walk the slab
    in (Bt, chunk, C) pieces; only one chunk's f32 temporaries are ever
    live. The input block itself stays bf16 in VMEM and is read twice —
    VMEM re-reads are free relative to the HBM traffic this kernel saves.
    """
    bt, s_len, c = x_ref.shape

    def stats_body(i, acc):
        s_acc, ss_acc = acc
        xa = x_ref[:, pl.dslice(i * chunk, chunk), :].astype(jnp.float32)
        return s_acc + jnp.sum(xa, axis=1), ss_acc + jnp.sum(xa * xa, axis=1)

    zero = jnp.zeros((bt, c), jnp.float32)
    s, ss = jax.lax.fori_loop(0, s_len // chunk, stats_body, (zero, zero))
    gs = jnp.dot(jnp.dot(s, reduce_ref[...],
                         preferred_element_type=jnp.float32),
                 bcast_ref[...], preferred_element_type=jnp.float32)
    gss = jnp.dot(jnp.dot(ss, reduce_ref[...],
                          preferred_element_type=jnp.float32),
                  bcast_ref[...], preferred_element_type=jnp.float32)
    mean = gs / n_per_group  # (Bt, C): each channel holds its group's mean
    var = gss / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    def write_body(i, carry):
        xa = x_ref[:, pl.dslice(i * chunk, chunk), :].astype(jnp.float32)
        y = ((xa - mean[:, None, :]) * inv[:, None, :] * scale_ref[...]
             + bias_ref[...])
        if swish:
            y = y * jax.nn.sigmoid(y)
        o_ref[:, pl.dslice(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, s_len // chunk, write_body, 0)


def fused_group_norm(x: Array, scale: Array, bias: Array, *,
                     num_groups: int = 32, eps: float = 1e-6,
                     swish: bool = False, interpret: bool = False) -> Array:
    """GroupNorm(+swish) over channel-last x of any rank >= 2."""
    orig_shape = x.shape
    c = orig_shape[-1]
    b = orig_shape[0]
    s = int(np.prod(orig_shape[1:-1])) if len(orig_shape) > 2 else 1
    x3 = x.reshape(b, s, c)
    onehot = _group_onehot(c, num_groups)
    reduce_m = jnp.asarray(onehot)
    bcast_m = jnp.asarray(onehot.T)
    scale = jnp.asarray(scale, jnp.float32).reshape(1, c)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, c)

    bt, chunk, _ = _plan(b, s, c, x.dtype.itemsize)

    kern = functools.partial(_kernel, eps=eps, swish=swish,
                             n_per_group=float(s * (c // num_groups)),
                             chunk=chunk)
    out = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(x3, scale, bias, reduce_m, bcast_m)
    return out.reshape(orig_shape)


def _plan(b: int, s: int, c: int, itemsize: int):
    """(bt, chunk, est_vmem_bytes) for the kernel's one cost model.

    The allocator double-buffers the input AND output blocks (CLAUDE.md:
    measured on this stack even for constant index maps), so the resident
    cost is 4x the block plus the live chunk temporaries. One shared plan
    keeps the support gate and the kernel on identical arithmetic — the
    flash-attention itemsize bug (ADVICE round 2) is the cautionary tale.
    """
    # batch-block: big slabs amortize per-program overhead
    slab_elems = s * c
    bt = max(1, min(b, (1 << 20) // max(1, slab_elems)))
    while b % bt != 0:
        bt -= 1
    # S-chunk so one chunk's f32 temporaries stay ~2MB (see _kernel)
    chunk = s
    while bt * chunk * c > (1 << 19) and chunk % 2 == 0:
        chunk //= 2
    est = (4 * bt * slab_elems * itemsize       # in + out, double-buffered
           + 3 * bt * chunk * c * 4             # live f32 chunk temps
           + 2 * bt * c * 4 * 4)                # s/ss/mean/inv pairs
    return bt, chunk, est


_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16MB scoped cap


def group_norm_supported(x_shape, num_groups: int = 32,
                         itemsize: int = 2) -> bool:
    """Can fused_group_norm handle this shape on the current backend?"""
    if jax.default_backend() != "tpu":
        return False
    c = x_shape[-1]
    if c % num_groups != 0:
        return False
    b = x_shape[0]
    s = int(np.prod(x_shape[1:-1])) if len(x_shape) > 2 else 1
    _, _, est = _plan(b, s, c, itemsize)
    return est <= _VMEM_BUDGET
