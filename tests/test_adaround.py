"""AdaRound quantizer tests: init, soft/hard equivalence, reference parity."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, init_scale
from qdiffusion_tpu.quant.adaround import (
    adaround_init_alpha,
    adaround_quant,
    adaround_soft_targets,
)

REF = Path("/root/reference")


def test_alpha_init_recovers_fractional_rest():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    delta = jnp.float32(0.05)
    alpha = adaround_init_alpha(w, delta)
    rest = w / delta - jnp.floor(w / delta)
    np.testing.assert_allclose(adaround_soft_targets(alpha), rest, atol=1e-4)


def test_soft_init_reproduces_weight():
    """At init h(alpha) == frac(w/delta), so soft fake-quant is the identity
    up to grid clamping — the AdaRound starting point before optimization."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    spec = AffineQuantizerSpec(n_bits=4, scale_method="max")
    delta, zp = init_scale(w, spec)
    alpha = adaround_init_alpha(w, delta)
    q = {"delta": delta, "zero_point": zp, "alpha": alpha}
    soft = adaround_quant(w, q, spec, soft=True)
    expected = (jnp.clip(w / delta + zp, 0, spec.n_levels - 1) - zp) * delta
    np.testing.assert_allclose(soft, expected, atol=1e-4)


def test_hard_rounding_is_floor_or_ceil():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    spec = AffineQuantizerSpec(n_bits=8, scale_method="max")
    delta, zp = init_scale(w, spec)
    alpha = adaround_init_alpha(w, delta)
    q = {"delta": delta, "zero_point": zp, "alpha": alpha}
    hard = adaround_quant(w, q, spec, soft=False)
    grid = np.asarray(hard / delta + zp)
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-4)
    # hard rounding moves each weight to floor or ceil of w/delta
    w_over_d = np.asarray(w / delta)
    ints = np.asarray(jnp.clip(jnp.round(hard / delta), np.floor(w_over_d).min(), None))
    assert np.all((ints >= np.floor(w_over_d) - 1e-4) | (ints <= np.ceil(w_over_d) + 1e-4))


def test_alpha_is_differentiable():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    spec = AffineQuantizerSpec(n_bits=4, scale_method="max")
    delta, zp = init_scale(w, spec)
    alpha = adaround_init_alpha(w, delta)

    def loss(a):
        q = {"delta": delta, "zero_point": zp, "alpha": a}
        return jnp.sum(adaround_quant(w, q, spec, soft=True) ** 2)

    g = jax.grad(loss)(alpha)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_against_reference_torch():
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from qdiff.quant_layer import UniformAffineQuantizer
    from qdiff.adaptive_rounding import AdaRoundQuantizer

    rng = np.random.default_rng(5)
    w_np = rng.normal(size=(16, 64)).astype(np.float32)
    w_t = torch.from_numpy(w_np)
    uaq = UniformAffineQuantizer(n_bits=4, symmetric=False, channel_wise=False,
                                 scale_method="max")
    _ = uaq(w_t)  # init delta/zp
    ar = AdaRoundQuantizer(uaq=uaq, weight_tensor=w_t,
                           round_mode="learned_hard_sigmoid")
    ar.soft_targets = True
    ref_soft = ar(w_t).detach().numpy()
    ar.soft_targets = False
    ref_hard = ar(w_t).detach().numpy()

    spec = AffineQuantizerSpec(n_bits=4, scale_method="max")
    w = jnp.asarray(w_np)
    delta, zp = init_scale(w, spec)
    np.testing.assert_allclose(float(delta), float(uaq.delta), rtol=1e-5)
    alpha = adaround_init_alpha(w, delta)
    q = {"delta": delta, "zero_point": zp, "alpha": alpha}
    np.testing.assert_allclose(adaround_quant(w, q, spec, soft=True), ref_soft,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(adaround_quant(w, q, spec, soft=False), ref_hard,
                               rtol=1e-4, atol=1e-5)
