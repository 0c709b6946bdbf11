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
             unquantized layers fall back to simulation. Runs the MXU in
             int8 (2x bf16 peak on v5e).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.unet_ddim import _sub
from qdiffusion_tpu.ops.int8 import pack_layer, weight_int_values
from qdiffusion_tpu.ops.qlayers import split_weight
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

Array = jnp.ndarray


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


def make_quantized_step(model, params: dict, qstate: dict,
                        engine: str = "int8",
                        has_context: bool = False,
                        carrier_dtype=jnp.bfloat16) -> Callable:
    """Jitted quantized denoise step (x, t[, context]) -> eps.

    carrier_dtype: inter-layer activation dtype for the int8 engine
    (bf16 default halves HBM traffic; pass jnp.float32 for bit-level
    comparison against the fake-quant simulation)."""
    if engine == "fold":
        folded = fold_weights(model, params, qstate)

        @jax.jit
        def step_fold(x, t, *ctx_args):
            return model.apply(folded, x, t, *ctx_args)

        return step_fold

    packed = pack_model(model, params, qstate) if engine == "int8" else {}
    mode = QuantMode(w=True, a=True, soft=False)
    # bf16 carriers between layers on the deployed path: the int8 kernels
    # quantize from/dequantize to bf16 (grid math stays f32), halving
    # inter-layer HBM traffic vs the f32 simulation.
    carrier = carrier_dtype if engine == "int8" else None

    @jax.jit
    def step(x, t, *ctx_args):
        in_dtype = x.dtype
        if carrier is not None:
            x = x.astype(carrier)
        ctx = QuantCtx(qstate, mode=mode, engine="int8" if packed else "sim",
                       packed=packed)
        if ctx_args:
            out = model.apply(params, x, t, ctx, context=ctx_args[0])
        else:
            out = model.apply(params, x, t, ctx)
        return out.astype(in_dtype)

    return step
