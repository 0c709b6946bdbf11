"""Pallas int4 weight-streaming matmul: parity vs XLA reference.

Runs in Pallas interpret mode on CPU (conftest forces the cpu backend);
the compiled path is exercised on the real chip by scripts/bench_stream.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.ops.pallas import int4_matmul as m


def _ref(x, nib, scale, off, const=None):
    """Reference of the kernel math: y = scale*(x@nib) + off*S(x) + const,
    products in bf16 like the kernel (nibbles 0..15 are exact in bf16)."""
    xb = x.astype(jnp.bfloat16)
    acc = jnp.dot(xb, nib.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    s = jnp.sum(xb.astype(jnp.float32), axis=-1, keepdims=True)
    y = acc * scale + s * off
    return y + const if const is not None else y


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    nib = jnp.asarray(rng.integers(0, 16, (64, 32)), jnp.uint8)
    wp = m.pack_int4_weight(nib)
    assert wp.shape == (32, 32) and wp.dtype == jnp.uint8
    back = m.unpack_int4_weight(wp)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(nib, np.int32))


@pytest.mark.parametrize("shape", [(128, 512, 256), (256, 1024, 512)])
def test_kernel_matches_reference(shape):
    M, K, N = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    nib = jnp.asarray(rng.integers(0, 16, (K, N)), jnp.uint8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    off = jnp.asarray(rng.uniform(-0.05, 0.0, (N,)), jnp.float32)
    const = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    got = m.int4_stream_matmul(x, m.pack_int4_weight(nib), scale, off, const,
                               tile_m=128, tile_n=256, tile_k2=256,
                               interpret=True)
    ref = _ref(x, nib, scale, off, const)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_kernel_equals_dequantized_matmul():
    """The fused form equals a plain matmul against the dequantized weight
    w = nib*scale + off (the fold-engine computation) at bf16 resolution."""
    rng = np.random.default_rng(2)
    M, K, N = 128, 512, 256
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    nib = jnp.asarray(rng.integers(0, 16, (K, N)), jnp.uint8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    off = -8.0 * scale  # symmetric grid: off = -(center+zp)*delta, zp=0

    got = m.int4_stream_matmul(x, m.pack_int4_weight(nib), scale, off,
                               tile_m=128, tile_n=256, tile_k2=256,
                               interpret=True)
    w_deq = nib.astype(jnp.float32) * scale + off
    ref = jnp.dot(x, w_deq)
    rel = (np.linalg.norm(np.asarray(got) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 5e-3, rel  # bf16 products vs f32 reference


def test_wrapper_pads_arbitrary_shapes():
    rng = np.random.default_rng(3)
    for M, K, N in [(5, 96, 160), (37, 200, 130), (2, 126, 77)]:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        keven = K + (K % 2)
        nib = jnp.asarray(rng.integers(0, 16, (keven, N)), jnp.uint8)
        if K % 2:
            nib = nib.at[-1].set(0)  # pad row must be inert
        scale = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
        off = jnp.asarray(rng.uniform(-0.05, 0.0, (N,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (0, K % 2)))
        got = m.int4_dense_stream(xp, m.pack_int4_weight(nib), scale, off,
                                  bias=bias, out_dtype=jnp.float32,
                                  interpret=True)
        ref = _ref(xp, nib, scale, off, bias)
        assert got.shape == (M, N)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)


def test_wrapper_leading_dims():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 7, 64)).astype(np.float32))
    nib = jnp.asarray(rng.integers(0, 16, (64, 96)), jnp.uint8)
    scale = jnp.full((96,), 0.01, jnp.float32)
    off = jnp.full((96,), -0.08, jnp.float32)
    got = m.int4_dense_stream(x, m.pack_int4_weight(nib), scale, off,
                              out_dtype=jnp.float32, interpret=True)
    ref = _ref(x.reshape(-1, 64), nib, scale, off).reshape(2, 7, 96)
    assert got.shape == (2, 7, 96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_stream_engine_uses_int4_pack_for_dense():
    """A 4-bit stream pack nibble-packs dense weights; the engine forward
    matches the fold engine (same integer grid) at bf16 resolution."""
    from qdiffusion_tpu.calib.engine import init_weight_qstate
    from qdiffusion_tpu.deploy import make_quantized_step, stream_pack_model
    from qdiffusion_tpu.models.unet_ddim import (
        DDIMUNet, DDIMUNetConfig, QuantPolicy, _sub)
    from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

    cfg = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=16)
    policy = QuantPolicy(wq=AffineQuantizerSpec(
        n_bits=4, channel_wise=True, channel_axis=-1, scale_method="max"))
    model = DDIMUNet(cfg, policy)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)

    packed = stream_pack_model(model, params, qstate)
    dense_names = [n for n in packed
                   if _sub(params, n)["w"].ndim == 2]
    assert dense_names
    for n in dense_names:
        for seg in packed[n]["segs"]:
            assert "wp" in seg and seg["wp"].dtype == jnp.uint8
            k, nout = _sub(params, n)["w"].shape
            assert seg["wp"].shape == ((k + 1) // 2, nout)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 300.0)
    fold_step = make_quantized_step(model, params, qstate, engine="fold")
    stream_step = make_quantized_step(model, params, qstate, engine="stream")
    y_fold = np.asarray(fold_step(x, t), np.float32)
    y_stream = np.asarray(stream_step(x, t), np.float32)
    rel = np.linalg.norm(y_stream - y_fold) / np.linalg.norm(y_fold)
    assert rel < 2e-2, rel
