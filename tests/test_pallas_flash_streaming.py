"""Streaming (two-pass) Pallas flash attention: parity vs the
materializing/XLA-blockwise paths (interpret mode on CPU; the compiled
16k-token path is exercised on the real chip — measured 1.29x the XLA
blockwise fallback, see docs/PERF_NOTES.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.ops.attention import (
    blockwise_attention,
    materializing_attention,
)
from qdiffusion_tpu.ops.pallas.flash_streaming import (
    streaming_flash_attention,
    streaming_supported,
)
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, init_state

INTERP = jax.default_backend() != "tpu"


def _qkv(B=2, T=24, S=300, H=2, D=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32), dtype)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32), dtype)
    return q, k, v


def test_fp_parity_multiblock():
    """S spans several key blocks incl. a padded tail."""
    q, k, v = _qkv()
    ref = materializing_attention(q, k, v, scale=0.25)
    got = streaming_flash_attention(q, k, v, scale=0.25, tile_q=8,
                                    block_k=128, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantized_parity():
    q, k, v = _qkv(seed=1)
    sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                  leaf_param=True, always_zero=True)
    v_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                 leaf_param=True)
    w = jax.nn.softmax(jnp.einsum("bihd,bjhd->bhij", q, k) * 0.25, axis=-1)
    sm_st = init_state(w, sm_spec)
    v_st = init_state(v, v_spec)
    ref = materializing_attention(q, k, v, scale=0.25,
                                  sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec))
    blk = blockwise_attention(q, k, v, scale=0.25, sm_q=(sm_st, sm_spec),
                              v_q=(v_st, v_spec), block_size=64,
                              allow_pallas=False)
    got = streaming_flash_attention(q, k, v, scale=0.25,
                                    sm_q=(sm_st, sm_spec),
                                    v_q=(v_st, v_spec), tile_q=8,
                                    block_k=128, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(blk),
                               rtol=1e-5, atol=1e-5)


def test_bf16_carrier():
    q, k, v = _qkv(seed=2, dtype=jnp.bfloat16)
    sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max",
                                  leaf_param=True, always_zero=True)
    sm_st = {"delta": jnp.float32(1 / 255.0), "zero_point": jnp.float32(0.0)}
    ref = materializing_attention(q, k, v, scale=0.25, sm_q=(sm_st, sm_spec))
    got = streaming_flash_attention(q, k, v, scale=0.25,
                                    sm_q=(sm_st, sm_spec), tile_q=8,
                                    block_k=128, interpret=INTERP)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_unaligned_shapes():
    q, k, v = _qkv(B=1, T=10, S=67, H=1, D=12, seed=3)
    ref = materializing_attention(q, k, v, scale=0.3)
    got = streaming_flash_attention(q, k, v, scale=0.3, tile_q=8,
                                    block_k=128, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate():
    # S-independent: supported wherever a TPU backend exists
    assert streaming_supported((1, 128, 1, 64), (1, 1 << 20, 1, 64)) == (
        jax.default_backend() == "tpu")


def test_partitioned_no_allgather():
    """Same batch/head custom_partitioning rule as the resident kernel."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    q, k, v = _qkv(B=8, T=16, S=160, H=2, D=16, seed=5)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    data = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda q, k, v: streaming_flash_attention(
        q, k, v, scale=0.25, tile_q=8, block_k=64, interpret=INTERP),
        in_shardings=(data, data, data), out_shardings=data)
    hlo = fn.lower(q, k, v).compile().as_text()
    assert len(re.findall(r"all-gather", hlo)) == 0
    got = fn(jax.device_put(q, data), jax.device_put(k, data),
             jax.device_put(v, data))
    ref = materializing_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
