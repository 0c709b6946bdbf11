"""Uniform affine fake quantization, functional and jit-friendly.

Semantics match the reference UniformAffineQuantizer
(qdiff/quant_layer.py:36-200) exactly, including its quirks:

  * n_levels = 2**n_bits for asymmetric, 2**(n_bits-1)-1 for symmetric.
  * Forward clamp: [0, n_levels-1] asymmetric; [-n_levels-1, n_levels]
    symmetric (quant_layer.py:84-87).
  * 'max' scale init clamps x_min<=0<=x_max for the zero point but uses the
    *raw* min/max span for delta (quant_layer.py:142-160).
  * 'mse' scale init: 80-point shrink grid, L2.4 loss (LAPQ), candidate
    quantization clamps to [0, n_levels-1] but the returned delta divides by
    2**n_bits - 1 (quant_layer.py:162-190).
  * Running-stat EMA with momentum 0.95 updates (x_min, x_max) then
    recomputes delta; zero_point only refreshed when asymmetric
    (quant_layer.py:91-110).

Unlike the reference, a quantizer here is (spec, state): the static
`AffineQuantizerSpec` plus a state dict {"delta", "zero_point"[, "x_min",
"x_max"]} that lives in a pytree and checkpoints as-is. Channel-wise
quantization is vectorized (the reference loops channels in Python,
quant_layer.py:126-127); `channel_axis` is configurable because TPU weights
are HWIO (out-channel last), not OIHW.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

__all__ = [
    "AffineQuantizerSpec",
    "round_ste",
    "lp_loss",
    "fake_quant",
    "init_scale",
    "init_state",
    "ema_update",
]


@dataclasses.dataclass(frozen=True)
class AffineQuantizerSpec:
    """Static configuration of one uniform affine quantizer."""

    n_bits: int = 8
    symmetric: bool = False
    channel_wise: bool = False
    scale_method: str = "max"  # 'max' family ('max', 'scale_max', ...) or 'mse'
    leaf_param: bool = False  # activation quantizer: delta is learnable, EMA stats
    always_zero: bool = False  # post-softmax: zero_point pinned to 0, min pinned 0
    channel_axis: int = 0  # axis holding channels when channel_wise

    @property
    def n_levels(self) -> int:
        return 2 ** (self.n_bits - 1) - 1 if self.symmetric else 2**self.n_bits

    def replace(self, **kw) -> "AffineQuantizerSpec":
        return dataclasses.replace(self, **kw)


def round_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Round with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def lp_loss(pred: jnp.ndarray, tgt: jnp.ndarray, p: float = 2.0,
            reduction: str = "none", axis: int = 1) -> jnp.ndarray:
    """L_p reconstruction loss.

    reduction='none' sums |pred-tgt|^p over `axis` then means the rest
    (reference lp_loss, quant_layer.py:26-33, where axis 1 is the NCHW
    channel axis — callers on NHWC data pass axis=-1).
    """
    err = jnp.abs(pred - tgt) ** p
    if reduction == "none":
        return jnp.mean(jnp.sum(err, axis=axis))
    return jnp.mean(err)


def fake_quant(x: jnp.ndarray, delta: jnp.ndarray, zero_point: jnp.ndarray,
               spec: AffineQuantizerSpec) -> jnp.ndarray:
    """Quantize-dequantize with STE rounding.

    The grid math runs in f32 (bf16 cannot place an 8-bit grid exactly);
    the result returns in x's dtype so bf16 carriers stay bf16.
    """
    orig_dtype = x.dtype
    n_levels = spec.n_levels
    x_int = round_ste(x.astype(jnp.float32) / delta) + zero_point
    if spec.symmetric:
        x_quant = jnp.clip(x_int, -n_levels - 1, n_levels)
    else:
        x_quant = jnp.clip(x_int, 0, n_levels - 1)
    return ((x_quant - zero_point) * delta).astype(orig_dtype)


def _minmax_scale(x_min, x_max, spec: AffineQuantizerSpec):
    """'max'-method delta/zero_point from (batched) min/max scalars."""
    n_levels = spec.n_levels
    lo = jnp.minimum(x_min, 0.0)
    hi = jnp.maximum(x_max, 0.0)
    if "scale" in spec.scale_method:
        lo = lo * (spec.n_bits + 2) / 8
        hi = hi * (spec.n_bits + 2) / 8
    if spec.symmetric:
        absmax = jnp.maximum(jnp.abs(lo), hi)
        delta = absmax / n_levels
    else:
        delta = (x_max - x_min) / (n_levels - 1)
    delta = jnp.maximum(delta, 1e-8)
    if spec.symmetric or spec.always_zero:
        zero_point = jnp.zeros_like(delta)
    else:
        zero_point = jnp.round(-lo / delta)
    return delta, zero_point


def _mse_scale(x2d: jnp.ndarray, spec: AffineQuantizerSpec):
    """'mse'-method scale search, vectorized over an 80-point shrink grid.

    x2d: (C, N) — C independent channels (C=1 for per-tensor). The reference
    searches shrink factors 1.0 - 0.01*i for i in [0, 80) minimizing
    mean(|x - q(x)|^2.4) (quant_layer.py:162-177).
    """
    n_bits = spec.n_bits
    n_levels = spec.n_levels
    x_max = jnp.max(x2d, axis=1)  # (C,)
    x_min = jnp.min(x2d, axis=1)
    shrink = 1.0 - 0.01 * jnp.arange(80, dtype=x2d.dtype)  # (80,)
    new_max = x_max[:, None] * shrink[None, :]  # (C, 80)
    new_min = x_min[:, None] * shrink[None, :]

    if spec.always_zero:
        delta_c = new_max / (2**n_bits - 1)
        zp_c = jnp.zeros_like(delta_c)
    else:
        delta_c = (new_max - new_min) / (2**n_bits - 1)
        zp_c = jnp.round(-new_min / jnp.maximum(delta_c, 1e-12))
    # guard all-zero tensors (e.g. zero-initialized output convs): the
    # reference would divide by zero here; clamp like its 'max' branch.
    delta_c = jnp.maximum(delta_c, 1e-8)

    # candidate fake-quant: clamp [0, n_levels-1] (reference quantize()).
    xq = jnp.round(x2d[:, None, :] / delta_c[:, :, None])  # (C, 80, N)
    xq = jnp.clip(xq + zp_c[:, :, None], 0, n_levels - 1)
    xq = (xq - zp_c[:, :, None]) * delta_c[:, :, None]
    score = jnp.mean(jnp.abs(x2d[:, None, :] - xq) ** 2.4, axis=2)  # (C, 80)
    best = jnp.argmin(score, axis=1)  # (C,)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    return take(delta_c), take(zp_c)


def init_scale(x: jnp.ndarray, spec: AffineQuantizerSpec):
    """Compute (delta, zero_point) from a representative tensor.

    Per-channel when spec.channel_wise: statistics reduce over every axis
    except spec.channel_axis, and the returned arrays broadcast against x
    (shape 1s everywhere except the channel axis).
    """
    if spec.channel_wise:
        axis = spec.channel_axis % x.ndim
        xc = jnp.moveaxis(x, axis, 0).reshape(x.shape[axis], -1)  # (C, N)
        if "max" in spec.scale_method:
            delta, zp = _minmax_scale(
                jnp.min(xc, axis=1), jnp.max(xc, axis=1),
                spec.replace(channel_wise=False))
        elif spec.scale_method == "mse":
            delta, zp = _mse_scale(xc, spec)
        else:
            raise NotImplementedError(spec.scale_method)
        shape = [1] * x.ndim
        shape[axis] = x.shape[axis]
        return delta.reshape(shape), zp.reshape(shape)

    if "max" in spec.scale_method:
        return _minmax_scale(jnp.min(x), jnp.max(x), spec)
    elif spec.scale_method == "mse":
        delta, zp = _mse_scale(x.reshape(1, -1), spec)
        return delta[0], zp[0]
    raise NotImplementedError(spec.scale_method)


def init_state(x: jnp.ndarray, spec: AffineQuantizerSpec) -> dict:
    """Full initial quantizer state from a representative tensor."""
    delta, zero_point = init_scale(x, spec)
    state = {"delta": delta, "zero_point": zero_point}
    if spec.leaf_param:
        state["x_min"] = jnp.min(x)
        state["x_max"] = jnp.max(x)
    return state


def ema_update(state: dict, x: jnp.ndarray, spec: AffineQuantizerSpec,
               momentum: float = 0.95) -> dict:
    """Running-stat update of an activation quantizer (reference
    act_momentum_update, quant_layer.py:91-110)."""
    n_levels = spec.n_levels
    x_min = momentum * state["x_min"] + (1 - momentum) * jnp.min(x)
    x_max = momentum * state["x_max"] + (1 - momentum) * jnp.max(x)
    if spec.symmetric:
        delta = jnp.maximum(jnp.abs(x_min), jnp.abs(x_max)) / n_levels
    elif spec.always_zero:
        delta = x_max / (n_levels - 1)
    else:
        delta = (x_max - x_min) / (n_levels - 1)
    delta = jnp.maximum(delta, 1e-8)
    zero_point = state["zero_point"]
    if not spec.symmetric:
        # reference only rewrites zp in the asymmetric branch; always_zero
        # quantizers keep zp == 0 (quant_layer.py:108-109).
        if not spec.always_zero:
            zero_point = jnp.round(-x_min / delta)
        else:
            zero_point = jnp.zeros_like(delta)
    return {**state, "delta": delta, "zero_point": zero_point,
            "x_min": x_min, "x_max": x_max}
