"""Real integer (int8-carrier) inference kernels.

The reference only *simulates* quantization in fp32 (fake-quant forward,
qdiff/quant_layer.py:66-89). Here the deployed path runs the MXU in int8:

    y = dx * dw[o] * conv_int32(x_q - zpx, w_q - zpw) + b

with both operands recentred to the signed int8 range:

    x_c = x_q - 128 (asym 8-bit acts)   cx = 128 - zpx
    w_c = w_q - 2^(b-1)                 cw[o] = 2^(b-1) - zpw[o]

    (x_c + cx) . (w_c + cw) = x_c.w_c + cw*S(x_c) + cx*sum(w_c) + cx*cw*K

Efficiency notes (TPU-specific):
  * S(x_c) — the per-window channel-sum of x_c — is one channel-reduce +
    one box reduce_window, shared across all output channels. (Carrying it
    as an extra all-ones weight column looks free but breaks the 128-lane
    output tiling — measured slower.)
  * Everything except the matmul and S is folded at pack time into three
    per-out-channel epilogue constants: y = A*conv + Bc*S + C, with
    A = dx*dw, Bc = dx*dw*cw, C = dx*dw*(cx*sum(w_c) + cx*cw*K) + bias.
  * Zero padding in the fake-quant domain corresponds to padding x_c with
    clip(zpx,0,255) - 128, done explicitly before a VALID conv.
  * Carriers between layers are bf16; the quantize grid math runs in f32
    (bf16's 8 mantissa bits cannot place an 8-bit grid exactly).

The result matches the fake-quant simulation bit-for-bit in integer space
(int32 accumulation is exact; only the epilogue scale is floating point).
Weights are packed once post-calibration with AdaRound hard rounding baked
into the int tensor.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu.ops.qlayers import LayerQuantConfig, split_weight
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

Array = jnp.ndarray


@dataclasses.dataclass
class PackedSegment:
    """One input-channel segment of a packed integer weight."""

    w_c: Array  # int8, recentred integer weight
    scale_a: Array  # A  = dx * dw                  (O,)
    scale_s: Array  # Bc = dx * dw * cw             (O,)
    const: Array  # C = dx*dw*(cx*wsum + cx*cw*K)  (O,)  (bias added once)
    a_delta: Array  # act quantizer delta (scalar, f32)
    a_zp: Array  # act quantizer zero point (scalar, f32)
    a_spec: AffineQuantizerSpec


@dataclasses.dataclass
class PackedWeight:
    segments: List[PackedSegment]
    bias: Optional[Array]


# register packed containers as pytrees (arrays are children, the static
# quantizer spec rides as aux data) so they can be passed as jit arguments
jax.tree_util.register_pytree_node(
    PackedSegment,
    lambda s: ((s.w_c, s.scale_a, s.scale_s, s.const, s.a_delta, s.a_zp),
               s.a_spec),
    lambda spec, ch: PackedSegment(*ch, a_spec=spec),
)
jax.tree_util.register_pytree_node(
    PackedWeight,
    lambda p: ((p.segments, p.bias), None),
    lambda _, ch: PackedWeight(segments=ch[0], bias=ch[1]),
)


def weight_int_values(w: Array, st: dict, spec: AffineQuantizerSpec) -> Array:
    """Integer grid values of a calibrated weight quantizer (AdaRound hard
    rounding when alpha present, nearest otherwise)."""
    delta, zp = st["delta"], st["zero_point"]
    if "alpha" in st:
        w_int = jnp.floor(w / delta) + (st["alpha"] >= 0).astype(w.dtype)
    else:
        w_int = jnp.round(w / delta)
    if spec.symmetric:
        return jnp.clip(w_int + zp, -spec.n_levels - 1, spec.n_levels)
    return jnp.clip(w_int + zp, 0, spec.n_levels - 1)


def _pack_segment(w: Array, wst: dict, ast: dict, cfg: LayerQuantConfig,
                  out_axis: int) -> PackedSegment:
    spec = cfg.wq
    wq = weight_int_values(w, wst, spec)
    w_center = 0.0 if spec.symmetric else float(2 ** (spec.n_bits - 1))
    w_c = (wq - w_center).astype(jnp.int8)
    red_axes = tuple(a for a in range(w.ndim) if a != out_axis % w.ndim)
    wsum = jnp.sum(w_c.astype(jnp.float32), axis=red_axes).reshape(-1)
    k_elems = float(np.prod([w.shape[a] for a in red_axes]))
    n_out = w.shape[out_axis]

    def per_channel(a):
        a = jnp.asarray(a, jnp.float32).reshape(-1)
        return jnp.broadcast_to(a, (n_out,)) if a.size == 1 else a

    dw = per_channel(wst["delta"])
    cw = per_channel(w_center - jnp.asarray(wst["zero_point"], jnp.float32))

    a_spec = cfg.aq
    a_delta = jnp.asarray(ast["delta"], jnp.float32)
    a_zp = jnp.asarray(ast["zero_point"], jnp.float32)
    a_center = 0.0 if a_spec.symmetric else float(2 ** (a_spec.n_bits - 1))
    cx = a_center - a_zp  # scalar (activation quantizers are per-tensor)

    scale_a = a_delta * dw
    scale_s = scale_a * cw
    const = scale_a * (cx * wsum + cx * cw * k_elems)

    return PackedSegment(
        w_c=w_c, scale_a=scale_a, scale_s=scale_s,
        const=const, a_delta=a_delta, a_zp=a_zp, a_spec=a_spec)


def pack_layer(p: dict, lstate: dict, cfg: LayerQuantConfig) -> PackedWeight:
    """Pack a calibrated conv/dense layer for integer inference."""
    w = p["w"]
    out_axis = w.ndim - 1  # HWIO / (in,out) / LIO: out channels last
    segments = []
    if cfg.split:
        w_a, w_b = split_weight(w, cfg.split, cfg.in_axis)
        segments.append(_pack_segment(w_a, lstate["w"], lstate["a"], cfg, out_axis))
        segments.append(_pack_segment(w_b, lstate["w0"], lstate["a0"], cfg, out_axis))
    else:
        segments.append(_pack_segment(w, lstate["w"], lstate["a"], cfg, out_axis))
    return PackedWeight(segments=segments, bias=p.get("b"))


def quantize_act(x: Array, seg: PackedSegment) -> Array:
    """Activations -> recentred int8 carrier. Matches fake_quant clamping."""
    spec = seg.a_spec
    n_levels = spec.n_levels
    x = x.astype(jnp.float32)
    x_int = jnp.round(x / seg.a_delta) + seg.a_zp
    if spec.symmetric:
        x_q = jnp.clip(x_int, -n_levels - 1, n_levels)
        center = 0.0
    else:
        x_q = jnp.clip(x_int, 0, n_levels - 1)
        center = float(2 ** (spec.n_bits - 1))
    return (x_q - center).astype(jnp.int8)


def _pad_value_i8(seg: PackedSegment) -> Array:
    """Integer-domain value representing f32 zero (grid-clamped)."""
    if seg.a_spec.symmetric:
        return jnp.zeros((), jnp.int8)
    n_lv = seg.a_spec.n_levels
    return (jnp.clip(seg.a_zp, 0, n_lv - 1)
            - 2 ** (seg.a_spec.n_bits - 1)).astype(jnp.int8)


def _pad_amounts(padding: Union[str, int], k: Tuple[int, int],
                 stride: Tuple[int, int], shape) -> List[Tuple[int, int]]:
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    if padding == "VALID":
        return [(0, 0), (0, 0)]
    if padding == "SAME":
        out = []
        for dim, kk, s in zip(shape, k, stride):
            o = -(-dim // s)
            total = max(0, (o - 1) * s + kk - dim)
            out.append((total // 2, total - total // 2))
        return out
    return list(padding)


def int8_conv2d(x: Array, packed: PackedWeight, *, stride=1,
                padding: Union[str, int] = "SAME",
                out_dtype=None) -> Array:
    """Integer conv2d matching qconv2d's fake-quant semantics bit-exactly."""
    out_dtype = out_dtype or x.dtype
    if isinstance(stride, int):
        stride = (stride, stride)
    split_points = np.cumsum(
        [s.w_c.shape[2] for s in packed.segments])[:-1]
    xs = jnp.split(x, split_points, axis=-1) if len(packed.segments) > 1 else [x]
    acc = None
    for seg, xseg in zip(packed.segments, xs):
        kh, kw = seg.w_c.shape[0], seg.w_c.shape[1]
        pads = _pad_amounts(padding, (kh, kw), stride, xseg.shape[1:3])
        x_c = quantize_act(xseg, seg)
        if any(p != (0, 0) for p in pads):
            x_c = jax.lax.pad(x_c, _pad_value_i8(seg),
                              [(0, 0, 0)] + [(p[0], p[1], 0) for p in pads]
                              + [(0, 0, 0)])
        conv = jax.lax.conv_general_dilated(
            x_c, seg.w_c, stride, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        csum = jnp.sum(x_c.astype(jnp.float32), axis=-1, keepdims=True)
        s_win = jax.lax.reduce_window(
            csum, 0.0, jax.lax.add, (1, kh, kw, 1),
            (1, stride[0], stride[1], 1), "VALID")
        y = (conv.astype(jnp.float32) * seg.scale_a
             + s_win * seg.scale_s
             + seg.const)
        acc = y if acc is None else acc + y
    if packed.bias is not None:
        acc = acc + packed.bias
    return acc.astype(out_dtype)


def _quantize_dynamic(x: Array, st: dict, spec: AffineQuantizerSpec):
    """Activation -> (recentred int8, cx) from a calibrated state dict."""
    n_levels = spec.n_levels
    xf = x.astype(jnp.float32)
    x_int = jnp.round(xf / st["delta"]) + st["zero_point"]
    if spec.symmetric:
        x_q = jnp.clip(x_int, -n_levels - 1, n_levels)
        center = 0.0
    else:
        x_q = jnp.clip(x_int, 0, n_levels - 1)
        center = float(2 ** (spec.n_bits - 1))
    cx = center - jnp.asarray(st["zero_point"], jnp.float32)
    return (x_q - center).astype(jnp.int8), cx


def int8_einsum(eq: str, a: Array, b: Array, a_st: dict, b_st: dict,
                a_spec: AffineQuantizerSpec, b_spec: AffineQuantizerSpec,
                out_dtype=None) -> Array:
    """Integer einsum between two dynamically-quantized activations,
    bit-consistent with fake_quant(a) . fake_quant(b).

    Used for the attention matmuls of the deployed int8 engine (QK^T and
    attention-weights x V) — the reference only ever simulates these in
    fp32. Expansion of (a_c + ca)(b_c + cb) over the contracted labels:

        y = a_c.b_c + ca*S(b_c) + cb*S(a_c) + ca*cb*K

    where S(.) sums over the contracted axes and broadcasts into the output
    (per-tensor quantizers => ca, cb are scalars). Requires both operand
    grids to fit int8 (n_bits <= 8).
    """
    assert a_spec.n_bits <= 8 and b_spec.n_bits <= 8
    out_dtype = out_dtype or a.dtype
    lhs, out_lbl = eq.split("->")
    a_lbl, b_lbl = lhs.split(",")
    contracted = [c for c in a_lbl if c in b_lbl and c not in out_lbl]
    k_elems = 1.0
    for c in contracted:
        k_elems *= a.shape[a_lbl.index(c)]

    a_c, ca = _quantize_dynamic(a, a_st, a_spec)
    b_c, cb = _quantize_dynamic(b, b_st, b_spec)

    y = jnp.einsum(eq, a_c, b_c,
                   preferred_element_type=jnp.int32).astype(jnp.float32)

    def reduced_to_out(x_c, lbl):
        """sum x_c over its contracted axes, expanded to the output rank."""
        axes = tuple(i for i, c in enumerate(lbl) if c in contracted)
        s = jnp.sum(x_c.astype(jnp.float32), axis=axes)
        kept = [c for c in lbl if c not in contracted]
        # insert singleton dims for output labels this operand lacks
        for i, c in enumerate(out_lbl):
            if c not in kept:
                s = jnp.expand_dims(s, i)
                kept.insert(i, c)
        # transpose if kept order differs from out order (kept == out here
        # for all supported equations; guard anyway)
        if kept != list(out_lbl):
            s = jnp.einsum(f"{''.join(kept)}->{out_lbl}", s)
        return s

    y = (y + ca * reduced_to_out(b_c, b_lbl) + cb * reduced_to_out(a_c, a_lbl)
         + ca * cb * k_elems)
    scale = (jnp.asarray(a_st["delta"], jnp.float32)
             * jnp.asarray(b_st["delta"], jnp.float32))
    return (y * scale).astype(out_dtype)


# int8_dense backend: True routes through the Pallas fused-epilogue kernel
# (ops/pallas/int8_matmul.py), None auto-selects it on TPU, False forces
# the XLA path (CPU tests; interpret-mode parity is tested separately).
PALLAS_DENSE: Optional[bool] = None


def _use_pallas_dense() -> bool:
    if PALLAS_DENSE is not None:
        return PALLAS_DENSE
    return jax.default_backend() == "tpu"


def int8_dense(x: Array, packed: PackedWeight, out_dtype=None) -> Array:
    """Integer dense matching qdense's fake-quant semantics.

    On TPU the matmul + row-sum correction + dequant epilogue run as ONE
    Pallas kernel (single HBM write); elsewhere the same math goes through
    XLA's int8 dot plus elementwise passes."""
    out_dtype = out_dtype or x.dtype
    split_points = np.cumsum([s.w_c.shape[0] for s in packed.segments])[:-1]
    xs = jnp.split(x, split_points, axis=-1) if len(packed.segments) > 1 else [x]
    use_pallas = _use_pallas_dense()
    acc = None
    for seg, xseg in zip(packed.segments, xs):
        x_c = quantize_act(xseg, seg)
        if use_pallas:
            from qdiffusion_tpu.ops.pallas.int8_matmul import int8_dense_pallas

            lead = x_c.shape[:-1]
            y = int8_dense_pallas(
                x_c.reshape(-1, x_c.shape[-1]), seg.w_c,
                seg.scale_a, seg.scale_s, seg.const,
                out_dtype=jnp.float32)
            y = y.reshape(*lead, -1)
        else:
            mm = jax.lax.dot_general(
                x_c, seg.w_c, (((x_c.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s_sum = jnp.sum(x_c.astype(jnp.float32), axis=-1, keepdims=True)
            y = (mm.astype(jnp.float32) * seg.scale_a
                 + s_sum * seg.scale_s
                 + seg.const)
        acc = y if acc is None else acc + y
    if packed.bias is not None:
        acc = acc + packed.bias
    return acc.astype(out_dtype)
