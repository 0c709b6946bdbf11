"""FLOP / BOPS accounting.

The reference ships thop hooks it never calls (count_flops_attn,
openaimodel.py:330-347) and defers BOPS measurement to DeepSpeed
(README.md:103). Here both are first-class:

  * `xla_flops(fn, *args)` — exact compiled-program FLOPs from XLA's cost
    analysis (what actually runs, post-fusion).
  * `model_bops(model, batch_shapes)` — bit-operations of the quantized
    model: for each conv/dense, MACs * w_bits * a_bits (the metric used in
    the Q-Diffusion paper's efficiency tables), walking the model's
    layer-quant configs so split layers and mixed precisions are counted
    correctly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def xla_flops(fn, *args) -> Optional[float]:
    """FLOPs of the compiled jitted function, or None if unavailable."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def conv_macs(x_shape, w_shape, stride=(1, 1)) -> int:
    """MACs of an NHWC x HWIO conv with SAME-style output size."""
    n, h, w, _ = x_shape
    kh, kw, cin, cout = w_shape
    oh, ow = -(-h // stride[0]), -(-w // stride[1])
    return n * oh * ow * cout * kh * kw * cin


def dense_macs(x_shape, w_shape) -> int:
    cin, cout = w_shape
    lead = int(np.prod(x_shape[:-1]))
    return lead * cin * cout


def model_bops(layer_shapes: Dict[str, dict], layer_cfgs: Dict[str, object],
               default_a_bits: int = 16, default_w_bits: int = 16) -> float:
    """Total bit-operations.

    layer_shapes: name -> {"macs": int}; layer_cfgs: name -> LayerQuantConfig
    (bits read from wq/aq specs). Layers without a config count at the
    default (unquantized) precision.
    """
    total = 0.0
    for name, info in layer_shapes.items():
        cfg = layer_cfgs.get(name)
        wb = cfg.wq.n_bits if cfg is not None else default_w_bits
        ab = cfg.aq.n_bits if cfg is not None else default_a_bits
        total += info["macs"] * wb * ab
    return total
