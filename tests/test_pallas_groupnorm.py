"""Fused GroupNorm Pallas kernel: parity vs the XLA reference path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn
from qdiffusion_tpu.ops.pallas.groupnorm import (
    fused_group_norm,
    group_norm_supported,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 128), 32),    # CIFAR resblock shape
    ((2, 4, 4, 256), 32),    # downsampled
    ((3, 64, 128), 32),      # (B, T, C) attention pre-norm
    ((2, 8, 8, 96), 32),     # C not a multiple of 128 lanes
])
def test_parity_vs_xla(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3.0 + 0.5
    c = shape[-1]
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    ref = nn.group_norm(x, scale, bias, num_groups=groups)
    got = fused_group_norm(x, scale, bias, num_groups=groups,
                           interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_bf16_carrier():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    ref = nn.group_norm(x, scale, bias)
    got = fused_group_norm(x, scale, bias,
                           interpret=jax.default_backend() != "tpu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 output resolution


def test_fused_swish():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref = nn.swish(nn.group_norm(x, scale, bias))
    got = fused_group_norm(x, scale, bias, swish=True,
                           interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_supported_gating():
    # CPU backend in tests -> gate must say no (falls back to XLA path)
    assert group_norm_supported((2, 8, 8, 128)) == (
        jax.default_backend() == "tpu")
    assert not group_norm_supported((2, 8, 8, 100))  # C % 32 != 0


def test_nn_flag_routing(monkeypatch):
    """nn.group_norm honors the FUSED_GROUPNORM flag (no-op on CPU where
    the support gate is closed — output must stay identical)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    ref = nn.group_norm(x, scale, bias)
    monkeypatch.setattr(nn, "FUSED_GROUPNORM", True)
    got = nn.group_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
