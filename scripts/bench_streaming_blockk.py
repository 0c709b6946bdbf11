"""Streaming-flash block_k experiment: does a raised scoped-VMEM limit
let bigger K/V blocks win? (ROADMAP 3b(b) / VERDICT r2 #7, real TPU.)

At 16k+ keys the streaming kernel runs block_k=1024 because Mosaic
double-buffers each K/V block against the ~16MB scoped-VMEM default.
CompilerParams(vmem_limit_bytes=...) raises the cap; this measures
block_k in {512, 1024, 2048, 4096} x vmem_limit in {default, 32M, 64M}
at the 16k- and 32k-token shapes, plus the XLA lax.scan fallback.

Usage: python scripts/bench_streaming_blockk.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu.ops.attention import blockwise_attention
from qdiffusion_tpu.ops.pallas.flash_streaming import streaming_flash_attention

LOOP = 10
T0 = time.perf_counter()


def log(msg):
    print(f"[blockk +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def timed(fn, q, k, v, tag):
    @jax.jit
    def run(q, k, v):
        out = jax.lax.fori_loop(
            0, LOOP, lambda i, qq: fn(qq, k, v).astype(qq.dtype), q)
        return jnp.sum(out.astype(jnp.float32))

    def sync(qq):
        return float(run(qq, k, v))

    try:
        sync(q); sync(q + 0.002)
    except Exception as e:
        log(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        sync(q + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    log(f"{tag}: {best * 1e3:.3f} ms")
    return best


def main():
    scale = 40 ** -0.5
    for S in (16384, 32768):
        log(f"== {S} tokens (B1 H8 D40 bf16) ==")
        q = jax.random.normal(jax.random.PRNGKey(0), (1, S, 8, 40),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (1, S, 8, 40),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (1, S, 8, 40),
                              jnp.bfloat16)
        timed(lambda q, k, v: blockwise_attention(
            q, k, v, scale=scale, allow_pallas=False), q, k, v,
            f"S{S} xla-scan")
        for bk in (512, 1024, 2048, 4096):
            for lim, ltag in ((0, "def"), (32 << 20, "32M"), (64 << 20, "64M")):
                timed(lambda q, k, v, bk=bk, lim=lim:
                      streaming_flash_attention(
                          q, k, v, scale=scale, block_k=bk, vmem_limit=lim),
                      q, k, v, f"S{S} bk{bk} vmem-{ltag}")


if __name__ == "__main__":
    main()
