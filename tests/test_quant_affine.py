"""Unit tests for uniform affine quantizer math.

Golden values are computed against the reference UniformAffineQuantizer
semantics (qdiff/quant_layer.py) — re-derived by hand and, when the
reference repo is importable, cross-checked numerically against it.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.quant.affine import (
    AffineQuantizerSpec,
    fake_quant,
    init_scale,
    init_state,
    ema_update,
    round_ste,
    lp_loss,
)

REF = Path("/root/reference")


def ref_quantizer(**kw):
    """Instantiate the reference torch quantizer if available."""
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    from qdiff.quant_layer import UniformAffineQuantizer

    return UniformAffineQuantizer(**kw)


def test_round_ste_values_and_grad():
    import jax

    x = jnp.array([0.4, 0.6, -1.2, 2.5])
    np.testing.assert_allclose(round_ste(x), np.round(np.asarray(x)))
    g = jax.grad(lambda v: jnp.sum(round_ste(v) ** 2))(x)
    # STE: d/dx round(x)^2 == 2*round(x)
    np.testing.assert_allclose(g, 2 * np.round(np.asarray(x)))


def test_asym_max_init_and_forward():
    spec = AffineQuantizerSpec(n_bits=8, symmetric=False, scale_method="max")
    x = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    delta, zp = init_scale(x, spec)
    # delta = (2 - (-1)) / 255, zp = round(1/delta)
    np.testing.assert_allclose(delta, 3.0 / 255, rtol=1e-6)
    np.testing.assert_allclose(zp, np.round(255 / 3.0))
    xq = fake_quant(x, delta, zp, spec)
    assert np.max(np.abs(np.asarray(xq) - np.asarray(x))) <= float(delta) / 2 + 1e-7


def test_sym_max_init_matches_reference_quirk():
    # symmetric: n_levels = 2**(b-1) - 1, delta = absmax / n_levels
    spec = AffineQuantizerSpec(n_bits=8, symmetric=True, scale_method="max")
    x = jnp.array([-3.0, 1.0, 2.0])
    delta, zp = init_scale(x, spec)
    np.testing.assert_allclose(delta, 3.0 / 127, rtol=1e-6)
    np.testing.assert_allclose(zp, 0.0)
    # clamp range is [-n_levels-1, n_levels] = [-128, 127]
    big = jnp.array([-100.0, 100.0])
    xq = fake_quant(big, delta, zp, spec)
    np.testing.assert_allclose(xq, [-128 * 3.0 / 127, 127 * 3.0 / 127], rtol=1e-5)


def test_always_zero_mode():
    spec = AffineQuantizerSpec(n_bits=8, always_zero=True, scale_method="mse")
    x = jnp.linspace(0, 1.0, 100)  # post-softmax-like, nonnegative
    delta, zp = init_scale(x, spec)
    assert float(zp) == 0.0
    xq = fake_quant(x, delta, zp, spec)
    assert float(jnp.min(xq)) >= 0.0


def test_mse_init_beats_naive_minmax_loss():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([rng.normal(0, 0.1, 4000), [5.0]]), jnp.float32)
    spec_mse = AffineQuantizerSpec(n_bits=4, scale_method="mse")
    d_mse, zp_mse = init_scale(x, spec_mse)
    spec_max = AffineQuantizerSpec(n_bits=4, scale_method="max")
    d_max, zp_max = init_scale(x, spec_max)
    q_mse = fake_quant(x, d_mse, zp_mse, spec_mse)
    q_max = fake_quant(x, d_max, zp_max, spec_max)
    err = lambda q: float(jnp.mean(jnp.abs(x - q) ** 2.4))
    assert err(q_mse) < err(q_max)  # outlier shrinks under MSE search


def test_channel_wise_init_last_axis():
    # HWIO weights: per-out-channel on the last axis
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * np.linspace(0.1, 2, 16), jnp.float32)
    spec = AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                               scale_method="max")
    delta, zp = init_scale(w, spec)
    assert delta.shape == (1, 1, 1, 16)
    # each channel's delta equals its own span / 255
    for c in [0, 7, 15]:
        span = float(w[..., c].max() - w[..., c].min())
        np.testing.assert_allclose(float(delta[0, 0, 0, c]), span / 255, rtol=1e-5)


def test_ema_update_matches_reference_formula():
    spec = AffineQuantizerSpec(n_bits=8, leaf_param=True, scale_method="max")
    x0 = jnp.array([-1.0, 1.0])
    state = init_state(x0, spec)
    x1 = jnp.array([-3.0, 2.0])
    new = ema_update(state, x1, spec, momentum=0.95)
    exp_min = 0.95 * (-1.0) + 0.05 * (-3.0)
    exp_max = 0.95 * 1.0 + 0.05 * 2.0
    np.testing.assert_allclose(new["x_min"], exp_min, rtol=1e-6)
    np.testing.assert_allclose(new["x_max"], exp_max, rtol=1e-6)
    np.testing.assert_allclose(new["delta"], (exp_max - exp_min) / 255, rtol=1e-6)


@pytest.mark.parametrize("n_bits,symmetric,method", [
    (8, False, "max"), (4, False, "max"), (8, True, "max"),
    (8, False, "mse"), (4, False, "mse"),
])
def test_against_reference_torch(n_bits, symmetric, method):
    import torch

    q = ref_quantizer(n_bits=n_bits, symmetric=symmetric, channel_wise=False,
                      scale_method=method)
    rng = np.random.default_rng(42)
    x_np = rng.normal(size=(256,)).astype(np.float32)
    ref_out = q(torch.from_numpy(x_np)).numpy()

    spec = AffineQuantizerSpec(n_bits=n_bits, symmetric=symmetric,
                               scale_method=method)
    delta, zp = init_scale(jnp.asarray(x_np), spec)
    ours = np.asarray(fake_quant(jnp.asarray(x_np), delta, zp, spec))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_channel_wise_against_reference_torch():
    import torch

    q = ref_quantizer(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max")
    rng = np.random.default_rng(7)
    w_oihw = rng.normal(size=(16, 8, 3, 3)).astype(np.float32)
    ref_out = q(torch.from_numpy(w_oihw)).numpy()

    # ours: HWIO layout, channel on last axis
    w_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
    spec = AffineQuantizerSpec(n_bits=4, channel_wise=True, channel_axis=-1,
                               scale_method="max")
    delta, zp = init_scale(w_hwio, spec)
    ours = np.transpose(np.asarray(fake_quant(w_hwio, delta, zp, spec)),
                        (3, 2, 0, 1))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_lp_loss_matches_reference_dim1_semantics():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 8, 5, 5)).astype(np.float32)
    b = rng.normal(size=(4, 8, 5, 5)).astype(np.float32)
    expected = np.mean(np.sum(np.abs(a - b) ** 2.0, axis=1))
    got = float(lp_loss(jnp.asarray(a), jnp.asarray(b), p=2.0, axis=1))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
