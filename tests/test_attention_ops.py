"""Blockwise (flash-style) attention: exact parity with the materializing
path, including static-delta quantization of softmax weights and values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdiffusion_tpu.ops.attention import (
    blockwise_attention,
    materializing_attention,
)
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, init_state


def _qkv(key, B=2, T=96, S=96, H=4, D=16):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, T, H, D))
    k = jax.random.normal(ks[1], (B, S, H, D))
    v = jax.random.normal(ks[2], (B, S, H, D))
    return q, k, v


@pytest.mark.parametrize("block", [32, 64, 96, 100])
def test_blockwise_matches_materializing_fp(block):
    q, k, v = _qkv(jax.random.PRNGKey(0))
    scale = 16 ** -0.5
    ref = materializing_attention(q, k, v, scale=scale)
    got = blockwise_attention(q, k, v, scale=scale, block_size=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_blockwise_matches_with_quantizers():
    q, k, v = _qkv(jax.random.PRNGKey(1))
    scale = 16 ** -0.5
    # calibrate sm/v quantizers on the materializing path's tensors
    w = jax.nn.softmax(
        jnp.einsum("bihd,bjhd->bhij", q, k) * scale, axis=-1)
    sm_spec = AffineQuantizerSpec(n_bits=8, always_zero=True,
                                  scale_method="max", leaf_param=True)
    v_spec = AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True)
    sm_st = init_state(w, sm_spec)
    v_st = init_state(v, v_spec)

    ref = materializing_attention(q, k, v, scale=scale,
                                  sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec))
    got = blockwise_attention(q, k, v, scale=scale,
                              sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec),
                              block_size=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_blockwise_cross_attention_shapes():
    # cross-attention: S != T (e.g. 77-token text context)
    q, _, _ = _qkv(jax.random.PRNGKey(2), T=64)
    _, k, v = _qkv(jax.random.PRNGKey(3), S=77)
    out = blockwise_attention(q, k, v, scale=0.25, block_size=32)
    assert out.shape == q.shape
    ref = materializing_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_blockwise_memory_shape_independence():
    """The jaxpr of the blockwise path contains no (T, S) intermediate."""
    q, k, v = _qkv(jax.random.PRNGKey(4), T=128, S=128)
    jaxpr = jax.make_jaxpr(
        lambda q, k, v: blockwise_attention(q, k, v, scale=0.25,
                                            block_size=32))(q, k, v)
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            shape = getattr(var.aval, "shape", ())
            assert not (len(shape) >= 2 and shape[-1] == 128
                        and shape[-2] == 128), f"materialized TxS: {shape}"
