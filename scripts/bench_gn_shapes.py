"""GroupNorm micro-bench at the SD UNet's hot shapes: XLA vs Pallas.

The SD CFG-step ablation (scripts/bench_sd_ablation.py) attributes
8.94 ms of the 78.12 ms step to GroupNorm statistics. The CIFAR-shape
micro-bench (PERF_NOTES) had XLA winning (0.121 vs 0.138 ms); this
re-runs the comparison at the SD shapes (bigger C, 4096-token slabs)
where the one-pass Pallas kernel's single read/write might flip it.

Timing: chained fori_loop feeding outputs back (the axon tunnel dedupes
identical dispatches; see CLAUDE.md).

Usage: python scripts/bench_gn_shapes.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn
from qdiffusion_tpu.ops.pallas.groupnorm import (fused_group_norm,
                                                 group_norm_supported)

LOOP = 50
T0 = time.perf_counter()


def log(msg):
    print(f"[gn +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def time_fn(fn, x, scale, bias):
    @jax.jit
    def run(x, scale, bias):
        def body(i, xx):
            return fn(xx, scale, bias).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, LOOP, body, x)
                       .astype(jnp.float32))

    float(run(x, scale, bias))  # compile
    best = float("inf")
    for i in range(3):
        xx = x + 0.001 * (i + 1)
        jax.block_until_ready(xx)
        t0 = time.perf_counter()
        float(run(xx, scale, bias))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    return best


def main():
    # The SD v1 UNet's GroupNorm sites at CFG batch 8 (NHWC)
    shapes = [
        (8, 64, 64, 320),
        (8, 32, 32, 640),
        (8, 16, 16, 1280),
        (8, 8, 8, 1280),
    ]
    key = jax.random.PRNGKey(0)
    print(f"{'shape':>20s} {'xla':>9s} {'pallas':>9s} {'pallas+sw':>9s} "
          f"{'xla gn.sw':>9s}")
    for shp in shapes:
        c = shp[-1]
        x = jax.random.normal(key, shp, jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        t_xla = time_fn(lambda xx, s, b: nn.group_norm(xx, s, b), x, scale,
                        bias)
        t_xla_sw = time_fn(
            lambda xx, s, b: nn.swish(nn.group_norm(xx, s, b)), x, scale,
            bias)
        if group_norm_supported(shp):
            t_pl = time_fn(lambda xx, s, b: fused_group_norm(xx, s, b), x,
                           scale, bias)
            t_pl_sw = time_fn(
                lambda xx, s, b: fused_group_norm(xx, s, b, swish=True), x,
                scale, bias)
        else:
            t_pl = t_pl_sw = float("nan")
        log(f"{str(shp):>20s} {t_xla * 1e6:8.1f}u {t_pl * 1e6:8.1f}u "
            f"{t_pl_sw * 1e6:8.1f}u {t_xla_sw * 1e6:8.1f}u")


if __name__ == "__main__":
    main()
