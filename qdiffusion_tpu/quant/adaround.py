"""AdaRound adaptive rounding (Nagel et al. 2020), functional form.

Matches the reference AdaRoundQuantizer (qdiff/adaptive_rounding.py:9-78):
rectified-sigmoid soft rounding h(alpha) = clip(sigmoid(alpha)*(zeta-gamma)
+ gamma, 0, 1) with gamma=-0.1, zeta=1.1; alpha initialized so that
sigmoid(alpha) equals the fractional rounding remainder; hard rounding
(alpha >= 0) at inference. The quantized value clamps to [0, n_levels-1]
with the *asymmetric* level count inherited from the underlying affine
quantizer (adaptive_rounding.py:58).

The AdaRound state rides in the same pytree as the affine state: the weight
quantizer dict simply gains an "alpha" leaf — no class swap, no Parameter
promotion (contrast reference qdiff/utils.py:351-457).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

GAMMA, ZETA = -0.1, 1.1

__all__ = ["adaround_init_alpha", "adaround_soft_targets", "adaround_quant"]


def adaround_init_alpha(w: jnp.ndarray, delta: jnp.ndarray,
                        dtype=None) -> jnp.ndarray:
    """alpha such that sigmoid(alpha) == frac(w/delta) (adaptive_rounding.py:66-74).

    dtype: storage dtype for the alpha leaf (default: w's dtype). bfloat16
    halves the weight-sized alpha tree's HBM residency (~3.4 GB -> 1.7 GB
    for the 860M SD UNet) — the optimizer still accumulates in f32
    (recon.py upcasts at runner entry and casts back on exit), so only the
    stored value is rounded; alpha parameterizes a rectified sigmoid in
    (-0.1, 1.1) and the hard-rounding threshold is alpha >= 0, both
    insensitive at bf16's ~3-digit precision."""
    rest = w / delta - jnp.floor(w / delta)  # [0, 1)
    alpha = -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1)
    return alpha.astype(dtype) if dtype is not None else alpha


def adaround_soft_targets(alpha: jnp.ndarray) -> jnp.ndarray:
    """Rectified sigmoid h(alpha) in [0, 1]."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def adaround_quant(w: jnp.ndarray, qstate: dict, spec: AffineQuantizerSpec,
                   soft: bool) -> jnp.ndarray:
    """Fake-quantize weights with learned rounding.

    qstate: {"delta", "zero_point", "alpha"}. soft=True uses h(alpha)
    (training); soft=False uses the hard threshold alpha >= 0 (inference).
    """
    delta, zp, alpha = qstate["delta"], qstate["zero_point"], qstate["alpha"]
    w_floor = jnp.floor(w / delta)
    if soft:
        w_int = w_floor + adaround_soft_targets(alpha)
    else:
        w_int = w_floor + (alpha >= 0).astype(w.dtype)
    w_quant = jnp.clip(w_int + zp, 0, spec.n_levels - 1)
    return (w_quant - zp) * delta
