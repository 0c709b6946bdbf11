"""Deployment: turn (params, calibrated qstate) into a fast inference step.

Three engines:

  * 'sim'  — fake-quant simulation, bit-identical to calibration forward
             (what the reference ships; useful for validation).
  * 'fold' — weight-only deployment: bake the (AdaRound-rounded) dequantized
             weights into the param tree once and run plain convs. Zero
             overhead vs full precision; exactly equals the W-only
             fake-quant model.
  * 'int8' — real integer kernels (ops/int8.py) for every conv/dense with a
             calibrated activation quantizer; attention matmuls and
             unquantized layers fall back to simulation. Note: on the
             current v5e stack int8 MXU issue runs at ~bf16 rate (measured;
             see docs/ROADMAP.md "Known performance facts"), so this engine
             trades a little speed for integer-exact arithmetic; 'fold' is
             the fast deployment.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.unet_ddim import _sub
from qdiffusion_tpu.ops.int8 import pack_layer, weight_int_values
from qdiffusion_tpu.ops.qlayers import split_weight
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

Array = jnp.ndarray


@jax.tree_util.register_pytree_node_class
class StaticMeta:
    """Static (treedef-side) metadata inside a packed-weight pytree.

    Packed trees ride through jit as ARGUMENTS (never closures — see
    make_quantized_step), so plain int leaves would be traced; slicing by
    a traced bound is illegal. Wrapping shape metadata in this node keeps
    it in the treedef: hashable, static, part of the jit cache key."""

    def __init__(self, value):
        self.value = value

    def tree_flatten(self):
        return (), self.value

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux)

    def __repr__(self):
        return f"StaticMeta({self.value!r})"

    def __eq__(self, other):
        other_v = other.value if isinstance(other, StaticMeta) else other
        return self.value == other_v

    def __hash__(self):
        return hash(self.value)


def pack_model(model, params: dict, qstate: dict) -> dict:
    """PackedWeight per layer that has both weight and act quantizer state."""
    packed = {}
    for name, cfg in model.layer_cfgs.items():
        lstate = qstate.get(name)
        if not lstate or "w" not in lstate or "a" not in lstate:
            continue
        if cfg.split and ("w0" not in lstate or "a0" not in lstate):
            continue
        if cfg.aq.n_bits > 8 or cfg.wq.n_bits > 8:
            continue  # int8 carrier
        packed[name] = pack_layer(_sub(params, name), lstate, cfg)
    return packed


def stream_pack_model(model, params: dict, qstate: dict,
                      dense_only: bool = True) -> dict:
    """Weight-streaming pack: integer weights stay int8 in HBM and
    dequantize on the fly inside the matmul weight load (XLA fuses the
    convert+affine — measured ~1.5x on weight-bandwidth-bound dense
    chains; docs/PERF_NOTES.md). Weights quantized to <=4 bits are
    nibble-packed (two values per HBM byte) and served by the Pallas
    int4 streaming kernel (ops/pallas/int4_matmul.py) — half the weight
    bandwidth again; XLA has no fusible sub-byte representation.

    dense_only (default): only 2-D (dense) weights stream. dense_only=False
    additionally packs conv2d/conv1d weights RESHAPED to 2-D — (ci*kh*kw,
    co) in the (c, kh, kw) row order of lax.conv_general_dilated_patches —
    served by the Pallas streaming matmul over extracted patches
    (ops/qlayers.py::_stream_conv2d). XLA's own conv path materializes the
    dequantized weight each step (measured net loss, docs/PERF_NOTES.md),
    which is exactly what the Pallas path avoids: the int8/int4 weight
    converts in VMEM inside the kernel.

    Per layer: {"segs": [...], "bias"[, "kshape", "in_chs"]}. int8 seg:
    {"w_c", "scale", "shift"} with dequantized weight = w_c * scale +
    shift (per-out-channel affine; w_c recentred to signed int8, same math
    as ops/int8.py). int4 seg: {"wp", "scale4", "off4"} with weight =
    nib * scale4 + off4 and wp the K-halved nibble pack
    (ops/pallas/int4_matmul.py docstring). Conv packs carry kshape
    (spatial filter dims) and in_chs (per-segment input channels)."""
    packed = {}
    for name, cfg in model.layer_cfgs.items():
        lstate = qstate.get(name)
        if not lstate or "w" not in lstate:
            continue
        if cfg.split and "w0" not in lstate:
            continue
        if cfg.wq.n_bits > 8:
            continue
        if dense_only and _sub(params, name)["w"].ndim != 2:
            continue
        p = _sub(params, name)
        w = p["w"]
        is_conv = w.ndim != 2
        int4 = cfg.wq.n_bits <= 4
        center = 0.0 if cfg.wq.symmetric else float(2 ** (cfg.wq.n_bits - 1))

        def per_out(a, n_out):
            a = jnp.asarray(a, jnp.float32).reshape(-1)
            return jnp.broadcast_to(a, (n_out,))

        def to2d(a):
            # conv2d HWIO -> (ci*kh*kw, co); conv1d LIO -> (ci*kl, co).
            # Row order (c, *filter) matches conv_general_dilated_patches.
            if a.ndim == 4:
                return jnp.transpose(a, (2, 0, 1, 3)).reshape(-1, a.shape[-1])
            if a.ndim == 3:
                return jnp.transpose(a, (1, 0, 2)).reshape(-1, a.shape[-1])
            return a

        def seg(ww, st):
            wq = to2d(weight_int_values(ww, st, cfg.wq))
            delta = jnp.asarray(st["delta"], jnp.float32)
            if int4:
                # nib = wq + c in [0, 2^bits); w = nib*delta + off
                c = float(cfg.wq.n_levels + 1) if cfg.wq.symmetric else 0.0
                nib = (wq + c).astype(jnp.uint8)
                k = nib.shape[0]
                if k % 2:
                    nib = jnp.pad(nib, ((0, 1), (0, 0)))
                from qdiffusion_tpu.ops.pallas.int4_matmul import \
                    pack_int4_weight

                n_out = ww.shape[-1]
                off = -(c + per_out(st["zero_point"], n_out)) \
                    * per_out(delta, n_out)
                # the consumer recovers odd-K padding from 2*wp.shape[0]
                # vs the static segment width of x
                return {"wp": pack_int4_weight(nib),
                        "scale4": per_out(delta, n_out),
                        "off4": off}
            w_c = (wq - center).astype(jnp.int8)
            n_out = ww.shape[-1]
            shift = (center - per_out(st["zero_point"], n_out)) \
                * per_out(delta, n_out)
            return {"w_c": w_c,
                    "scale": per_out(delta, n_out).astype(jnp.bfloat16),
                    "shift": shift.astype(jnp.bfloat16)}

        if cfg.split:
            w_a, w_b = split_weight(w, cfg.split, cfg.in_axis)
            halves = [w_a, w_b]
            segs = [seg(w_a, lstate["w"]), seg(w_b, lstate["w0"])]
        else:
            halves = [w]
            segs = [seg(w, lstate["w"])]
        entry = {"segs": segs, "bias": p.get("b")}
        if is_conv:
            entry["kshape"] = StaticMeta(tuple(int(s) for s in w.shape[:-2]))
            entry["in_chs"] = StaticMeta(
                tuple(int(h.shape[-2]) for h in halves))
        packed[name] = entry
    return packed


def fold_weights(model, params: dict, qstate: dict, dtype=None) -> dict:
    """Bake dequantized (fake-quant) weights into a new param tree."""

    def fold_one(name, p):
        cfg = model.layer_cfg(name)
        lstate = qstate.get(name)
        if not lstate or "w" not in lstate:
            return p
        w = p["w"]
        if cfg.split:
            w_a, w_b = split_weight(w, cfg.split, cfg.in_axis)
            dq = []
            for slot, ww in (("w", w_a), ("w0", w_b)):
                st = lstate[slot]
                wq = weight_int_values(ww, st, cfg.wq)
                dq.append((wq - st["zero_point"]) * st["delta"])
            w_new = jnp.concatenate(dq, axis=cfg.in_axis)
        else:
            st = lstate["w"]
            wq = weight_int_values(w, st, cfg.wq)
            w_new = (wq - st["zero_point"]) * st["delta"]
        if dtype is not None:
            w_new = w_new.astype(dtype)
        return {**p, "w": w_new}

    new = jax.tree_util.tree_map(lambda x: x, params)  # deep copy structure

    def walk(node, prefix):
        for k in list(node.keys()):
            child = node[k]
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(child, dict):
                if "w" in child and path in model.layer_cfgs:
                    node[k] = fold_one(path, child)
                else:
                    walk(child, path)

    walk(new, "")
    return new


def export_quantized_checkpoint(model, params: dict, qstate: dict,
                                path) -> dict:
    """Serialize the deployed model as integer weights + scales.

    Weight tensors are stored as their quantized integer grid values —
    int8 carrier, nibble-packed for <=4-bit — plus per-channel (delta,
    zero_point). This realizes the paper's model-size claim (a W4 UNet
    checkpoint is ~8x smaller than fp32); the reference never materializes
    integer weights. Biases, norms, and non-quantized leaves ship as fp16.

    Returns a manifest {name: {"bits", "shape", "split"}}.
    """
    import numpy as np
    from pathlib import Path

    flat = {}
    manifest = {}

    def put_weight(key, w, st, spec):
        wq = np.asarray(weight_int_values(w, st, spec))
        bits = spec.n_bits
        if spec.symmetric:
            ints = (wq + spec.n_levels + 1).astype(np.uint8)  # shift to >=0
        else:
            ints = wq.astype(np.uint8)
        shape = ints.shape
        if bits <= 4:
            pad = (-ints.size) % 2
            v = np.concatenate([ints.reshape(-1), np.zeros(pad, np.uint8)])
            packed = (v[0::2] | (v[1::2] << 4)).astype(np.uint8)
            flat[f"{key}/int4"] = packed
        else:
            flat[f"{key}/int8"] = ints
        flat[f"{key}/delta"] = np.asarray(st["delta"], np.float32)
        flat[f"{key}/zero_point"] = np.asarray(st["zero_point"], np.float32)
        return shape

    def visit(node, prefix):
        for k, child in node.items():
            pathk = f"{prefix}.{k}" if prefix else k
            if isinstance(child, dict):
                if "w" in child and pathk in model.layer_cfgs:
                    cfg = model.layer_cfg(pathk)
                    lstate = qstate.get(pathk)
                    if lstate and "w" in lstate:
                        if cfg.split:
                            wa, wb = split_weight(child["w"], cfg.split,
                                                  cfg.in_axis)
                            sa = put_weight(f"{pathk}.w", wa, lstate["w"], cfg.wq)
                            sb = put_weight(f"{pathk}.w0", wb, lstate["w0"],
                                            cfg.wq)
                            manifest[pathk] = {"bits": cfg.wq.n_bits,
                                               "shape": [list(sa), list(sb)],
                                               "split": cfg.split,
                                               "axis": cfg.in_axis,
                                               "sym": cfg.wq.symmetric}
                        else:
                            s = put_weight(f"{pathk}.w", child["w"],
                                           lstate["w"], cfg.wq)
                            manifest[pathk] = {"bits": cfg.wq.n_bits,
                                               "shape": list(s), "split": 0,
                                               "sym": cfg.wq.symmetric}
                        if "b" in child and child["b"] is not None:
                            flat[f"{pathk}.b/fp16"] = np.asarray(
                                child["b"], np.float16)
                        continue
                visit(child, pathk)
            else:
                flat[f"{pathk}/fp16"] = np.asarray(child, np.float16)

    visit(params, "")
    import json

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(p, __manifest__=np.frombuffer(
        json.dumps(manifest).encode(), np.uint8), **flat)
    return manifest


def load_quantized_checkpoint(path) -> Tuple[dict, dict]:
    """Restore an exported checkpoint into (dequantized_params, manifest).

    The dequantized tree is ready for the 'fold' engine (bit-identical to
    folding the original weights with the same qstate)."""
    import json
    from pathlib import Path

    import numpy as np

    data = np.load(Path(path), allow_pickle=False)
    manifest = json.loads(bytes(data["__manifest__"]).decode())

    def assign(tree, dotted, value):
        parts = dotted.split(".")
        node = tree
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = value

    params: dict = {}

    def dequant(key, bits, shape, sym):
        n_levels = 2 ** (bits - 1) - 1 if sym else 2**bits
        if bits <= 4:
            packed = data[f"{key}/int4"]
            lo = packed & 0xF
            hi = packed >> 4
            ints = np.stack([lo, hi], axis=1).reshape(-1)
            ints = ints[: int(np.prod(shape))].reshape(shape)
        else:
            ints = data[f"{key}/int8"]
        ints = ints.astype(np.float32)
        if sym:
            ints = ints - (n_levels + 1)
        delta = data[f"{key}/delta"]
        zp = data[f"{key}/zero_point"]
        return (ints - zp) * delta

    seen = set()
    for name, info in manifest.items():
        sym = info.get("sym", False)
        if info["split"]:
            wa = dequant(f"{name}.w", info["bits"], info["shape"][0], sym)
            wb = dequant(f"{name}.w0", info["bits"], info["shape"][1], sym)
            w = np.concatenate([wa, wb], axis=info["axis"])
        else:
            w = dequant(f"{name}.w", info["bits"], info["shape"], sym)
        assign(params, f"{name}.w", w)
        seen.add(name)
    for key in data.files:
        if key.endswith("/fp16"):
            assign(params, key[: -len("/fp16")],
                   data[key].astype(np.float32))
    return params, manifest


def make_quantized_step(model, params: dict, qstate: dict,
                        engine: str = "int8",
                        has_context: bool = False,
                        carrier_dtype=jnp.bfloat16,
                        stream_convs=False) -> Callable:
    """Jitted quantized denoise step (x, t[, context]) -> eps.

    carrier_dtype: inter-layer activation dtype for the int8 engine
    (bf16 default halves HBM traffic; pass jnp.float32 for bit-level
    comparison against the fake-quant simulation)."""
    # Parameter trees are passed as jit ARGUMENTS, not closures: closed-over
    # device arrays get captured as program constants (multi-GB programs and
    # huge compile/transfer cost, especially on remote-compile setups).
    if engine == "fold":
        folded = fold_weights(model, params, qstate)

        @jax.jit
        def _fold_step(p, x, t, *ctx_args):
            return model.apply(p, x, t, *ctx_args)

        return lambda x, t, *ctx_args: _fold_step(folded, x, t, *ctx_args)

    if engine == "stream":
        # weight-only like 'fold', but dense weights stay int8 in HBM
        # (half the weight bandwidth; wins on weight-bound small-batch
        # shapes). stream_convs=True additionally packs conv weights for
        # the Pallas patch-matmul kernels (qlayers._stream_conv2d); each
        # conv site then streams only if the trace-time byte cost model
        # says the weight-bandwidth saving beats the patch overhead
        # (qlayers._stream_conv_profitable) — pass stream_convs="all" to
        # force every conv onto the streaming kernel (bench use).
        spacked = stream_pack_model(model, params, qstate,
                                    dense_only=not stream_convs)
        sfolded = fold_weights(model, params, qstate)
        smode = QuantMode(w=False, a=False)
        conv_mode = "all" if stream_convs == "all" else "auto"

        @jax.jit
        def _stream_step(p, pk, x, t, *ctx_args):
            ctx = QuantCtx(None, mode=smode, engine="stream", packed=pk,
                           conv_stream=conv_mode)
            if ctx_args:
                return model.apply(p, x, t, ctx, context=ctx_args[0])
            return model.apply(p, x, t, ctx)

        return lambda x, t, *ctx_args: _stream_step(sfolded, spacked, x, t,
                                                    *ctx_args)

    packed = pack_model(model, params, qstate) if engine == "int8" else {}
    mode = QuantMode(w=True, a=True, soft=False)
    # bf16 carriers between layers on the deployed path: the int8 kernels
    # quantize from/dequantize to bf16 (grid math stays f32), halving
    # inter-layer HBM traffic vs the f32 simulation.
    carrier = carrier_dtype if engine == "int8" else None
    use_int8 = bool(packed)

    @jax.jit
    def _step(p, q, pk, x, t, *ctx_args):
        in_dtype = x.dtype
        if carrier is not None:
            x = x.astype(carrier)
        ctx = QuantCtx(q, mode=mode, engine="int8" if use_int8 else "sim",
                       packed=pk)
        if ctx_args:
            out = model.apply(p, x, t, ctx, context=ctx_args[0])
        else:
            out = model.apply(p, x, t, ctx)
        return out.astype(in_dtype)

    return lambda x, t, *ctx_args: _step(params, qstate, packed, x, t,
                                         *ctx_args)
