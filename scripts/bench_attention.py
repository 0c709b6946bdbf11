"""Attention kernels at SD's 4096-token self-attention shape, real TPU."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu.ops.attention import (
    blockwise_attention, materializing_attention)
from qdiffusion_tpu.ops.pallas.flash_attention import flash_attention
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec


def time_fn(fn, q, k, v, tag="", loop=30):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = fn(q, k, v)
            return (q + 0.001 * o.astype(q.dtype))
        return jnp.sum(jax.lax.fori_loop(0, loop, body, q).astype(jnp.float32))

    def sync(qq):
        return float(run(qq, k, v))

    sync(q); sync(q + 0.002)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter(); sync(q + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / loop)
    print(f"{tag}: {best*1e3:.4f} ms", flush=True)
    return best


B, T, H, D = 2, 4096, 8, 40  # SD 64x64 self-attention
if len(sys.argv) > 1:
    T = int(sys.argv[1])  # e.g. 1024 (LDM-8 32x32), 2048, 4096
q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16)
scale = D ** -0.5

sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True,
                              always_zero=True)
v_spec = AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True)
sm_st = {"delta": jnp.float32(1/255.), "zero_point": jnp.float32(0.)}
v_st = {"delta": jnp.float32(0.03), "zero_point": jnp.float32(128.)}

time_fn(lambda q, k, v: materializing_attention(q, k, v, scale=scale),
        q, k, v, tag="materializing fp")
time_fn(lambda q, k, v: blockwise_attention(q, k, v, scale=scale,
                                            allow_pallas=False),
        q, k, v, tag="blockwise xla fp")
time_fn(lambda q, k, v: flash_attention(q, k, v, scale=scale),
        q, k, v, tag="pallas flash fp")
time_fn(lambda q, k, v: materializing_attention(
    q, k, v, scale=scale, sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec)),
        q, k, v, tag="materializing quant")
time_fn(lambda q, k, v: blockwise_attention(
    q, k, v, scale=scale, sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec),
    allow_pallas=False), q, k, v, tag="blockwise xla quant")
time_fn(lambda q, k, v: flash_attention(
    q, k, v, scale=scale, sm_q=(sm_st, sm_spec), v_q=(v_st, v_spec)),
        q, k, v, tag="pallas flash quant")

# parity on-chip
o_ref = materializing_attention(q, k, v, scale=scale, sm_q=(sm_st, sm_spec),
                                v_q=(v_st, v_spec))
o_fl = flash_attention(q, k, v, scale=scale, sm_q=(sm_st, sm_spec),
                       v_q=(v_st, v_spec))
rel = (np.linalg.norm(np.asarray(o_fl, np.float32)
                      - np.asarray(o_ref, np.float32))
       / np.linalg.norm(np.asarray(o_ref, np.float32)))
print(f"on-chip parity flash vs materializing: rel={rel:.2e}", flush=True)
