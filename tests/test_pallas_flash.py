"""Pallas flash attention: parity vs the materializing and blockwise
XLA paths (interpret mode on CPU; the compiled path is exercised on the
real chip by scripts/bench_attention.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.ops.attention import (
    blockwise_attention,
    materializing_attention,
)
from qdiffusion_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_supported,
)
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, init_state

INTERP = jax.default_backend() != "tpu"


def _qkv(B=2, T=24, S=40, H=2, D=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32), dtype)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32), dtype)
    return q, k, v


def test_fp_parity():
    q, k, v = _qkv()
    ref = materializing_attention(q, k, v, scale=0.25)
    got = flash_attention(q, k, v, scale=0.25, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantized_parity_vs_blockwise():
    """Quantized sm/v: identical static-delta semantics as the blockwise
    and materializing paths."""
    q, k, v = _qkv(seed=1)
    sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                  leaf_param=True, always_zero=True)
    v_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                 leaf_param=True)
    w = jax.nn.softmax(
        jnp.einsum("bihd,bjhd->bhij", q, k) * 0.25, axis=-1)
    sm_st = init_state(w, sm_spec)
    v_st = init_state(v, v_spec)

    ref = materializing_attention(q, k, v, scale=0.25,
                                  sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec))
    blk = blockwise_attention(q, k, v, scale=0.25,
                              sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec),
                              block_size=16)
    got = flash_attention(q, k, v, scale=0.25,
                          sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec),
                          interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(blk),
                               rtol=1e-5, atol=1e-5)


def test_bf16_carrier_parity():
    q, k, v = _qkv(seed=2, dtype=jnp.bfloat16)
    sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                  leaf_param=True, always_zero=True)
    sm_st = {"delta": jnp.float32(1 / 255.0), "zero_point": jnp.float32(0.0)}
    ref = materializing_attention(q, k, v, scale=0.25, sm_q=(sm_st, sm_spec))
    got = flash_attention(q, k, v, scale=0.25, sm_q=(sm_st, sm_spec),
                          interpret=INTERP)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_padding_unaligned_shapes():
    """T/S/D none 128-aligned: padding + masking must be exact."""
    q, k, v = _qkv(B=1, T=10, S=23, H=1, D=12, seed=3)
    ref = materializing_attention(q, k, v, scale=0.3)
    got = flash_attention(q, k, v, scale=0.3, tile_q=8, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate():
    assert flash_supported((2, 4096, 8, 40), (2, 4096, 8, 40)) == (
        jax.default_backend() == "tpu")
    # 8k keys reachable via q-tile shrink (measured VMEM cost model)
    assert flash_supported((2, 8192, 8, 40), (2, 8192, 8, 40)) == (
        jax.default_backend() == "tpu")
    # 16k+: double-buffered resident K/V exceeds scoped VMEM — refused
    # (the XLA blockwise path streams those)
    assert not flash_supported((2, 16384, 8, 40), (2, 16384, 8, 40))
    assert not flash_supported((1, 128, 1, 64), (1, 65536, 1, 64))
    # f32 inputs double the resident K/V footprint: 8k keys fit at bf16
    # but not at itemsize=4 — the gate must use the real dtype itemsize
    # (fp32 sim engine would otherwise pass the gate and fail in Mosaic)
    assert not flash_supported((2, 8192, 8, 40), (2, 8192, 8, 40), 4)


def test_no_silent_tile_fallback():
    """A shape no q-tile fits must raise, not compile a 128-tile kernel
    that blows the scoped-VMEM limit inside Mosaic."""
    import pytest

    q = jnp.zeros((1, 16384, 1, 40), jnp.bfloat16)
    k = jnp.zeros((1, 16384, 1, 40), jnp.bfloat16)
    with pytest.raises(ValueError, match="no q-tile fits"):
        flash_attention(q, k, q, scale=1.0, interpret=True)


def test_auto_tile_matches_fixed_tile():
    """tile_q=None auto-pick computes the same function as explicit tiles."""
    q, k, v = _qkv(B=1, T=16, S=48, H=2, D=16, seed=4)
    a = flash_attention(q, k, v, scale=0.25, tile_q=8, interpret=INTERP)
    b = flash_attention(q, k, v, scale=0.25, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_partitioned_no_allgather():
    """Under a sharded jit the kernel must split on batch/heads, not
    all-gather the full batch onto every device (custom_partitioning;
    without it the custom call replicates attention compute mesh-wide)."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    q, k, v = _qkv(B=8, T=64, S=64, H=2, D=16, seed=5)
    sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                  leaf_param=True, always_zero=True)
    sm_st = {"delta": jnp.float32(1 / 255.0), "zero_point": jnp.float32(0.0)}

    # DP: batch axis sharded 8-way
    mesh = Mesh(np.array(jax.devices()), ("data",))
    data = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, scale=0.25, sm_q=(sm_st, sm_spec), interpret=INTERP),
        in_shardings=(data, data, data), out_shardings=data)
    hlo = fn.lower(q, k, v).compile().as_text()
    assert len(re.findall(r"all-gather", hlo)) == 0
    got = fn(jax.device_put(q, data), jax.device_put(k, data),
             jax.device_put(v, data))
    ref = materializing_attention(q, k, v, scale=0.25,
                                  sm_q=(sm_st, sm_spec))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # TP: heads sharded over a model axis (megatron-style)
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    dsh = NamedSharding(mesh2, P("data", None, "model", None))
    fn2 = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, scale=0.25, interpret=INTERP),
        in_shardings=(dsh, dsh, dsh), out_shardings=dsh)
    hlo2 = fn2.lower(q, k, v).compile().as_text()
    assert len(re.findall(r"all-gather", hlo2)) == 0
    got2 = fn2(jax.device_put(q, dsh), jax.device_put(k, dsh),
               jax.device_put(v, dsh))
    ref2 = materializing_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_differentiable_ctx_keeps_materializing():
    """Reconstruction/Fisher forwards differentiate through attention; the
    Pallas kernel has no VJP, so differentiable contexts must not take the
    flash path."""
    from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    m = LDMUNet(LDMUNetConfig(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1,),
        num_heads=4), flash_threshold=16)
    infer = QuantCtx(None, mode=QuantMode.off())
    diff = QuantCtx(None, mode=QuantMode.off(), differentiable=True)
    assert m._use_blockwise(infer, 64)
    assert not m._use_blockwise(diff, 64)
    sub = QuantCtx(None, mode=QuantMode.off(), substitute={"x": 1})
    assert not m._use_blockwise(sub, 64)
