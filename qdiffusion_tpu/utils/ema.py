"""Exponential-moving-average helper for model parameters.

Pytree equivalent of the reference EMA helpers (ddim/models/ema.py:4-49 and
ldm LitEma, ema.py:5-82). At PTQ time checkpoints already hold EMA weights;
this exists for training-side parity and for the ema-scope swap used when
loading LDM checkpoints (ldm.py:449-450).
"""

from __future__ import annotations

from typing import Tuple

import jax


def ema_init(params) -> dict:
    """Shadow copy of params."""
    return jax.tree_util.tree_map(lambda p: p, params)


def ema_update(shadow, params, mu: float = 0.9999):
    """shadow <- mu * shadow + (1 - mu) * params (reference ema.py:22-27)."""
    return jax.tree_util.tree_map(
        lambda s, p: mu * s + (1.0 - mu) * p, shadow, params)


def ema_swap(shadow, params) -> Tuple[dict, dict]:
    """Swap live and shadow params (ema_scope context semantics)."""
    return params, shadow
