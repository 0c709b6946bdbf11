"""A/B the Pallas fused GroupNorm inside the full SD CFG step (real TPU).

The micro-bench (bench_gn_shapes.py) is blind below ~650us/op — the
tunnel's per-loop-iteration overhead floors it — so the only valid
comparison is at step level: the 8.94 ms GroupNorm-statistics slice of
the 78.12 ms SD step (bench_sd_ablation.py) either shrinks under the
one-pass Pallas kernel or it doesn't.

Usage: python scripts/bench_sd_gn.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn
from qdiffusion_tpu.config import SD_V1
from qdiffusion_tpu.models.unet_ldm import LDMUNet

B = 8
LOOP = 10
T0 = time.perf_counter()


def log(msg):
    print(f"[sd-gn +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def timed(model, params, x, t, c, tag):
    def step(x, p, c):
        return model.apply(p, x, t, context=c)

    @jax.jit
    def run(x, p, c):
        return jnp.sum(jax.lax.fori_loop(
            0, LOOP, lambda i, x: step(x, p, c).astype(x.dtype), x)
            .astype(jnp.float32))

    def sync(xx):
        return float(run(xx, params, c))

    log(f"compiling {tag}")
    sync(x); sync(x + 0.002)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        sync(x + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    log(f"{tag:12s} {best * 1e3:8.2f} ms/step")
    return best


def main():
    model = LDMUNet(SD_V1.unet_ldm)
    params = jax.jit(lambda k: to_bf16(model.init_params(k)))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log("params ready (860M, bf16)")
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4),
                          jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768), jnp.bfloat16)

    nn.FUSED_GROUPNORM = False
    a = timed(model, params, x, t, c, "xla-GN")
    nn.FUSED_GROUPNORM = True
    b = timed(model, params, x, t, c, "pallas-GN+sw")
    print(f"\nxla-GN {a * 1e3:.2f} ms  pallas-GN+swish {b * 1e3:.2f} ms  "
          f"ratio {a / b:.3f}x")


if __name__ == "__main__":
    main()
