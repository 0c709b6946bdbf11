"""Flash-attention q-tile size sweep at SD shapes, real TPU.

_pick_tile_q caps the q-tile at 128; at SD's hot shapes far larger tiles
fit the measured VMEM model (S=4096, Dp=128: tile 256 needs 8.4MB scores
+ 4MB double-buffered K/V of the 15MB budget). Larger tiles mean fewer
grid programs (less per-program overhead) and taller MXU dots. This
sweeps tile_q at the UNet's attention shapes under the headline CFG batch
to decide the default.

Usage: QDT_COMPILE_CACHE=... python scripts/bench_flash_tileq.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

if os.environ.get("QDT_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["QDT_COMPILE_CACHE"])

from qdiffusion_tpu.ops.pallas.flash_attention import (
    _pick_tile_q, _round_up, flash_attention)
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

T0 = time.perf_counter()


def log(msg):
    print(f"[tileq +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def time_fn(fn, q, k, v, tag, loop=30):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            return q + 0.001 * fn(q, k, v).astype(q.dtype)
        return jnp.sum(jax.lax.fori_loop(0, loop, body, q)
                       .astype(jnp.float32))

    def sync(qq):
        return float(run(qq, k, v))

    try:
        sync(q); sync(q + 0.002)
    except Exception as e:  # Mosaic VMEM failures surface at compile
        log(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter(); sync(q + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / loop)
    log(f"{tag}: {best*1e3:.4f} ms")
    return best


sm_spec = AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True,
                              always_zero=True)
sm_st = {"delta": jnp.float32(1 / 255.), "zero_point": jnp.float32(0.)}

# (B, T, H, D): SD CFG-batch-8 UNet self-attn sites + CIFAR/LDM shapes
SHAPES = [
    (8, 4096, 8, 40),    # SD ds1 (5 sites/step — the dominant slice)
    (8, 1024, 8, 80),    # SD ds2
    (8, 256, 8, 160),    # SD ds4
]

for B, T, H, D in SHAPES:
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16)
    scale = D ** -0.5
    auto = _pick_tile_q(_round_up(T, 128), _round_up(D, 128), 2)
    log(f"shape B{B} T{T} H{H} D{D}: auto tile {auto}")
    for tq in (128, 256, 512, 1024):
        if tq > T:
            continue
        time_fn(lambda q, k, v, tq=tq: flash_attention(
            q, k, v, scale=scale, tile_q=tq), q, k, v,
            f"T{T} fp   tile {tq}")
    for tq in (128, 256, 512):
        if tq > T:
            continue
        time_fn(lambda q, k, v, tq=tq: flash_attention(
            q, k, v, scale=scale, sm_q=(sm_st, sm_spec), tile_q=tq),
            q, k, v, f"T{T} quant tile {tq}")
