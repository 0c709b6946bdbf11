"""Does the flash kernel pay for the D=40 -> 128 lane padding?

Round-3 PERF_NOTES claimed the SD self-attention kernel "streams 3.2x the
needed QK^T depth" at D=40 (heads padded to 128 lanes), motivating a
head-packing experiment (3 heads = 120 lanes per dot). Before building
that kernel, this probe checks the premise: if Mosaic actually streamed
the padded 128-lane depth, kernel time would be ~independent of D in
[40, 128]; if it feeds only valid sublanes, time scales ~linearly in D
and the padding waste (hence head-packing's headroom) does not exist.

Roofline cross-check: at the bench shape (B2 H8 T=S=4096 D40) the kernel
measured 2.618 ms = ~164 TFLOPs on UNPADDED flops (2 dots x 2*B*H*T*S*D
= 4.3e11), 83% of v5e bf16 peak — already impossible if a 3.2x depth pad
were being streamed. This probe makes the scaling explicit.

Usage: python scripts/bench_headpack_probe.py   (real TPU)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu.ops.pallas.flash_attention import flash_attention

B, T, S, H = 2, 4096, 4096, 8
LOOP = 10


def bench_d(D: int) -> float:
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = flash_attention(q, k, v, scale=scale)
            return (q + o * 1e-6).astype(q.dtype)  # feed back: no dedup

        return jnp.sum(jax.lax.fori_loop(0, LOOP, body, q).astype(
            jnp.float32))

    float(run(q, k, v))  # compile
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(run(q + 0.001 * (i + 1), k, v))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    flops = 2 * 2 * B * H * T * S * D
    print(f"D={D:4d}: {best * 1e3:7.3f} ms  "
          f"{flops / best / 1e12:6.1f} TFLOPs (unpadded)", flush=True)
    return best


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} shape B{B} T{T} S{S} H{H}",
          flush=True)
    t40 = bench_d(40)
    t80 = bench_d(80)
    t128 = bench_d(128)
    print(f"t(128)/t(40) = {t128 / t40:.2f} "
          f"(1.0 => padded depth is streamed, ~3.2 => only valid depth; "
          f"in-between => partially bandwidth-bound)", flush=True)
