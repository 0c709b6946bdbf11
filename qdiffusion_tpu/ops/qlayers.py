"""Quantized conv / dense layer application.

Functional equivalents of the reference QuantModule (qdiff/quant_layer.py:
203-294): fake-quant the input activation and/or the weight, then run the
underlying op. Split-shortcut support quantizes the two concatenated halves
of the input channels (and the matching weight column blocks) with
independent quantizers before a single fused conv — the quantizer pair for
the second half lives in slots 'w0'/'a0'.

Layouts: activations NHWC (split on axis -1), conv weights HWIO (split on
axis 2 = input channels), dense weights (in, out) (split on axis 0).
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from qdiffusion_tpu import nn
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import QuantCtx

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LayerQuantConfig:
    """Static per-layer quantization config."""

    wq: AffineQuantizerSpec
    aq: AffineQuantizerSpec
    split: int = 0  # input-channel split point; 0 = no split
    disable_act_quant: bool = False
    in_axis: int = 2  # weight axis holding input channels (HWIO conv2d: 2,
    #                   dense (in,out): 0, conv1d LIO: 1)


def _quant_input(ctx: QuantCtx, name: str, x: Array, cfg: LayerQuantConfig):
    if cfg.disable_act_quant:
        return x
    if cfg.split:
        x0 = ctx.act_quant(name, "a", x[..., : cfg.split], cfg.aq)
        x1 = ctx.act_quant(name, "a0", x[..., cfg.split :], cfg.aq)
        return jnp.concatenate([x0, x1], axis=-1)
    return ctx.act_quant(name, "a", x, cfg.aq)


def split_weight(w: Array, split: int, in_axis: int):
    """Split a weight into its two input-channel column blocks."""
    idx0 = [slice(None)] * w.ndim
    idx1 = [slice(None)] * w.ndim
    idx0[in_axis] = slice(None, split)
    idx1[in_axis] = slice(split, None)
    return w[tuple(idx0)], w[tuple(idx1)]


def _quant_weight(ctx: QuantCtx, name: str, w: Array, cfg: LayerQuantConfig,
                  in_axis: int):
    if cfg.split:
        idx0 = [slice(None)] * w.ndim
        idx1 = [slice(None)] * w.ndim
        idx0[in_axis] = slice(None, cfg.split)
        idx1[in_axis] = slice(cfg.split, None)
        w0 = ctx.weight_quant(name, "w", w[tuple(idx0)], cfg.wq)
        w1 = ctx.weight_quant(name, "w0", w[tuple(idx1)], cfg.wq)
        return jnp.concatenate([w0, w1], axis=in_axis)
    return ctx.weight_quant(name, "w", w, cfg.wq)


def _stream_dequant(packed: dict, in_axis: int, dtype=jnp.bfloat16) -> Array:
    """int8-in-HBM weight -> carrier dtype, dequant fused into the consumer
    matmul/conv by XLA (deploy.stream_pack_model)."""

    def one(seg):
        if "wp" in seg:  # nibble-packed int4 (XLA fallback path)
            from qdiffusion_tpu.ops.pallas.int4_matmul import \
                unpack_int4_weight

            nib = unpack_int4_weight(seg["wp"]).astype(dtype)
            return (nib * seg["scale4"].astype(dtype)
                    + seg["off4"].astype(dtype))
        return (seg["w_c"].astype(dtype) * seg["scale"].astype(dtype)
                + seg["shift"].astype(dtype))

    parts = [one(seg) for seg in packed["segs"]]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                            axis=in_axis)


def _stream_dense_int4(packed: dict, x: Array, split: int) -> Array:
    """Dense layer with nibble-packed int4 weights streamed through the
    Pallas kernel (ops/pallas/int4_matmul.py). One kernel call per split
    segment (independent quantizer grids per half); bias fused into the
    first call's epilogue."""
    import jax

    from qdiffusion_tpu.ops.pallas.int4_matmul import int4_dense_stream

    interpret = jax.default_backend() != "tpu"
    segs = packed["segs"]
    bounds = [(0, x.shape[-1])] if len(segs) == 1 else \
        [(0, split), (split, x.shape[-1])]
    y = None
    for seg, (lo, hi) in zip(segs, bounds):
        xs = x[..., lo:hi]
        k_packed = 2 * seg["wp"].shape[0]
        if k_packed != hi - lo:  # odd-K segment was zero-padded at pack
            xs = jnp.pad(xs, [(0, 0)] * (xs.ndim - 1)
                         + [(0, k_packed - (hi - lo))])
        part = int4_dense_stream(
            xs, seg["wp"], seg["scale4"], seg["off4"],
            bias=packed.get("bias") if y is None else None,
            out_dtype=x.dtype, interpret=interpret)
        y = part if y is None else y + part
    return y


def _stream_seg_matmul(seg, flat: Array, bias, interpret: bool) -> Array:
    """(M, K) rows x one packed weight segment -> (M, N); dispatches to the
    int4 nibble kernel or the int8 weight-streaming kernel."""
    if "wp" in seg:
        from qdiffusion_tpu.ops.pallas.int4_matmul import int4_dense_stream

        k_packed = 2 * seg["wp"].shape[0]
        if k_packed != flat.shape[-1]:  # odd-K zero-pad at pack time
            flat = jnp.pad(flat, ((0, 0), (0, k_packed - flat.shape[-1])))
        return int4_dense_stream(flat, seg["wp"], seg["scale4"],
                                 seg["off4"], bias=bias,
                                 out_dtype=flat.dtype, interpret=interpret)
    from qdiffusion_tpu.ops.pallas.int8_matmul import int8_dense_stream

    return int8_dense_stream(flat, seg["w_c"], seg["scale"], seg["shift"],
                             bias=bias, out_dtype=flat.dtype,
                             interpret=interpret)


#: HBM-byte-equivalent fixed cost charged per streamed conv call (kernel
#: dispatch + grid overheads); calibrated so CIFAR-scale convs (where the
#: measured all-streamed step was 0.4x bf16) fall back to the folded path.
_STREAM_CONV_OVERHEAD_BYTES = 1 << 20


def _stream_conv_profitable(packed: dict, x: Array, *, stride) -> bool:
    """Trace-time byte cost model for conv weight streaming.

    Streaming pays only where the per-step weight-bandwidth saving
    (bf16 -> int8/int4 resident weights) exceeds the cost the streaming
    path adds: materializing kh*kw-amplified patches in HBM (write+read,
    bf16) plus a fixed per-kernel overhead. SD's low-resolution/high-
    channel convs and large 1x1 projections qualify at serving batch
    sizes; CIFAR-scale convs never do (measured 0.4x when forced —
    docs/PERF_NOTES.md 'Streamed convolutions')."""
    kh, kw = packed["kshape"].value
    k_total = n_out = 0
    w_int_bytes = 0
    for seg in packed["segs"]:
        if "wp" in seg:  # nibble-packed int4: K/2 bytes per column
            k_seg = 2 * seg["wp"].shape[0]
            n_out = seg["wp"].shape[1]
            w_int_bytes += seg["wp"].size
        else:
            k_seg, n_out = seg["w_c"].shape
            w_int_bytes += seg["w_c"].size
        k_total += k_seg
    w_bf16_bytes = 2 * k_total * n_out
    if isinstance(stride, int):
        stride = (stride, stride)
    b, h, w_sp = x.shape[0], x.shape[1], x.shape[2]
    m = b * -(-h // stride[0]) * -(-w_sp // stride[1])
    patch_bytes = 0 if (kh, kw) == (1, 1) and stride == (1, 1) \
        else 4 * m * k_total  # bf16 patch write + read
    return (w_bf16_bytes - w_int_bytes
            > patch_bytes + _STREAM_CONV_OVERHEAD_BYTES)


def _stream_conv2d(packed: dict, x: Array, *, stride=1,
                   padding="SAME") -> Array:
    """Conv2d with int8/int4 weights resident in HBM: XLA patch extraction
    + Pallas streaming matmul with the dequant fused into the VMEM weight
    load. XLA's own conv path materializes the dequantized weight in HBM
    every step (measured loser, docs/PERF_NOTES.md); on weight-bound
    batch-1 serving shapes the patch read amplification (kh*kw x on
    activations) is noise next to the 2-4x weight-bandwidth saving."""
    import jax
    from jax import lax

    kh, kw = packed["kshape"].value
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    interpret = jax.default_backend() != "tpu"
    c0, y = 0, None
    for seg, ci in zip(packed["segs"], packed["in_chs"].value):
        xs = x[..., c0:c0 + ci]
        c0 += ci
        if (kh, kw) == (1, 1) and stride == (1, 1):
            p = xs  # 1x1 stride-1: the patches ARE the input
        else:
            p = lax.conv_general_dilated_patches(
                xs, (kh, kw), stride, padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        B, Ho, Wo, K = p.shape
        bias = packed.get("bias") if y is None else None
        part = _stream_seg_matmul(seg, p.reshape(-1, K), bias, interpret)
        part = part.reshape(B, Ho, Wo, -1)
        y = part if y is None else y + part
    return y


def qconv2d(ctx: QuantCtx, name: str, p: dict, x: Array, cfg: LayerQuantConfig,
            *, stride=1, padding="SAME", feature_group_count: int = 1) -> Array:
    if ctx.engine == "int8" and name in ctx.packed:
        from qdiffusion_tpu.ops.int8 import int8_conv2d

        return int8_conv2d(x, ctx.packed[name], stride=stride, padding=padding)
    if ctx.engine == "stream" and name in ctx.packed:
        pk = ctx.packed[name]
        if "kshape" in pk and feature_group_count == 1 and (
                ctx.conv_stream == "all"
                or _stream_conv_profitable(pk, x, stride=stride)):
            return _stream_conv2d(pk, x, stride=stride, padding=padding)
        # cost model says fold (or grouped conv): params on the stream
        # engine are the folded tree (deploy.make_quantized_step), so the
        # plain conv below IS the folded bf16 path — fall through.
    x = _quant_input(ctx, name, x, cfg)
    w = _quant_weight(ctx, name, p["w"], cfg, in_axis=2)
    return nn.conv2d(x, w, p.get("b"), stride=stride, padding=padding,
                     feature_group_count=feature_group_count)


def qconv1d(ctx: QuantCtx, name: str, p: dict, x: Array, cfg: LayerQuantConfig,
            *, stride=1, padding="SAME") -> Array:
    if ctx.engine == "stream" and name in ctx.packed:
        import jax

        pk = ctx.packed[name]
        if pk.get("kshape") == (1,) and stride == 1:
            # k=1 conv1d (the AttentionBlock qkv/proj projections) is a
            # dense over channels: stream it through the Pallas kernels
            interpret = jax.default_backend() != "tpu"
            c0, y = 0, None
            for seg, ci in zip(pk["segs"], pk["in_chs"].value):
                xs = x[..., c0:c0 + ci]
                c0 += ci
                lead = xs.shape[:-1]
                part = _stream_seg_matmul(
                    seg, xs.reshape(-1, ci),
                    pk.get("bias") if y is None else None, interpret)
                part = part.reshape(*lead, -1)
                y = part if y is None else y + part
            return y
        if "kshape" in pk:
            # general-k conv1d has no deployed user (LDM uses k=1 only);
            # reconstruct per-segment LIO weights and run the XLA conv
            kl = pk["kshape"].value[0]
            c0, y = 0, None
            for seg, ci in zip(pk["segs"], pk["in_chs"].value):
                w2d = _stream_dequant({"segs": [seg]}, 0, x.dtype)
                w = w2d.reshape(ci, kl, -1).transpose(1, 0, 2)
                part = nn.conv1d(x[..., c0:c0 + ci], w,
                                 pk.get("bias") if y is None else None,
                                 stride=stride, padding=padding)
                c0 += ci
                y = part if y is None else y + part
            return y
        return nn.conv1d(x, _stream_dequant(pk, 1, x.dtype), pk.get("bias"),
                         stride=stride, padding=padding)
    x = _quant_input(ctx, name, x, cfg)
    w = _quant_weight(ctx, name, p["w"], cfg, in_axis=1)
    return nn.conv1d(x, w, p.get("b"), stride=stride, padding=padding)


def qdense(ctx: QuantCtx, name: str, p: dict, x: Array,
           cfg: LayerQuantConfig) -> Array:
    if ctx.engine == "int8" and name in ctx.packed:
        from qdiffusion_tpu.ops.int8 import int8_dense

        return int8_dense(x, ctx.packed[name])
    if ctx.engine == "stream" and name in ctx.packed:
        pk = ctx.packed[name]
        if any("wp" in seg for seg in pk["segs"]):
            return _stream_dense_int4(pk, x, cfg.split)
        return nn.dense(x, _stream_dequant(pk, 0, x.dtype), pk.get("bias"))
    x = _quant_input(ctx, name, x, cfg)
    w = _quant_weight(ctx, name, p["w"], cfg, in_axis=0)
    return nn.dense(x, w, p.get("b"))
