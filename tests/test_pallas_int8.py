"""Pallas int8 matmul kernel: parity vs the XLA reference computation.

Runs in Pallas interpret mode on CPU (conftest forces the cpu backend); the
compiled path is exercised on the real chip by bench/scale scripts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.ops.pallas import int8_matmul as m


def _interp(monkeypatch):
    """Force interpret mode for CPU testing."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        kw.pop("cost_estimate", None)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # re-point the module-level reference used inside the kernel wrapper
    monkeypatch.setattr(m.pl, "pallas_call", patched)


@pytest.mark.parametrize("shape", [(256, 512, 256), (512, 1024, 512)])
def test_kernel_matches_xla(monkeypatch, shape):
    _interp(monkeypatch)
    M, K, N = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    const = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    got = m.int8_matmul_dequant(x, w, scale, const,
                                tile_m=128, tile_n=256, tile_k=256)
    ref = (jnp.dot(x, w, preferred_element_type=jnp.int32).astype(jnp.float32)
           * scale + const)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_kernel_bf16_output(monkeypatch):
    _interp(monkeypatch)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-100, 100, (128, 256)), jnp.int8)
    w = jnp.asarray(rng.integers(-100, 100, (256, 256)), jnp.int8)
    scale = jnp.full((256,), 0.01, jnp.float32)
    const = jnp.zeros((256,), jnp.float32)
    got = m.int8_matmul_dequant(x, w, scale, const, tile_m=128, tile_n=256,
                                tile_k=256, out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    ref = jnp.dot(x, w, preferred_element_type=jnp.int32).astype(
        jnp.float32) * 0.01
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=1e-1)


def test_misaligned_shapes_rejected(monkeypatch):
    _interp(monkeypatch)
    x = jnp.zeros((100, 256), jnp.int8)
    w = jnp.zeros((256, 256), jnp.int8)
    with pytest.raises(AssertionError):
        m.int8_matmul_dequant(x, w, jnp.ones((256,)), jnp.zeros((256,)),
                              tile_m=128, tile_n=256, tile_k=256)


def test_kernel_row_sum_correction(monkeypatch):
    """Full epilogue: y = A*acc + Bc*S(x) + C (the asymmetric-activation
    correction the integer engine needs, ops/int8.py:22)."""
    _interp(monkeypatch)
    rng = np.random.default_rng(2)
    M, K, N = 128, 512, 256
    x = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    scale_a = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    scale_s = jnp.asarray(rng.uniform(-0.01, 0.01, (N,)), jnp.float32)
    const = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    got = m.int8_matmul_dequant(x, w, scale_a, const, scale_s,
                                tile_m=128, tile_n=256, tile_k=256)
    s = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    ref = (jnp.dot(x, w, preferred_element_type=jnp.int32).astype(jnp.float32)
           * scale_a + s * scale_s + const)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_dense_pallas_wrapper_pads(monkeypatch):
    """int8_dense_pallas handles arbitrary (M, K, N) via zero padding."""
    _interp(monkeypatch)
    rng = np.random.default_rng(3)
    M, K, N = 37, 200, 160  # none aligned
    x = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    scale_a = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    scale_s = jnp.asarray(rng.uniform(-0.01, 0.01, (N,)), jnp.float32)
    const = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    got = m.int8_dense_pallas(x, w, scale_a, scale_s, const)
    s = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    ref = (jnp.dot(x, w, preferred_element_type=jnp.int32).astype(jnp.float32)
           * scale_a + s * scale_s + const)
    assert got.shape == (M, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8_dense_routes_through_pallas(monkeypatch):
    """ops/int8.int8_dense with PALLAS_DENSE=True matches the XLA path
    bit-for-bit (same integer math, fused epilogue)."""
    _interp(monkeypatch)
    import jax as _jax

    from qdiffusion_tpu.ops import int8 as int8mod
    from qdiffusion_tpu.ops.qlayers import LayerQuantConfig
    from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, init_state

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(96, 160)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.normal(size=(160,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 7, 96)).astype(np.float32))
    cfg = LayerQuantConfig(
        wq=AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                               scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True))
    lstate = {"w": init_state(w, cfg.wq), "a": init_state(x, cfg.aq)}
    packed = int8mod.pack_layer({"w": w, "b": b}, lstate, cfg)

    monkeypatch.setattr(int8mod, "PALLAS_DENSE", False)
    ref = int8mod.int8_dense(x, packed)
    monkeypatch.setattr(int8mod, "PALLAS_DENSE", True)
    got = int8mod.int8_dense(x, packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
