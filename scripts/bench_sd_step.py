"""SD UNet step: MXU utilization + flash-attention contribution, real TPU.

Times the full-size SD v1 UNet denoise step at the headline CFG batch
(b4 task -> batch-8 UNet calls), flash dispatch on vs off, and anchors it
against the compiled program's exact FLOPs (XLA cost analysis) to show
how close the step runs to the chip's measured ~104 TFLOPs practical peak.

Usage: python scripts/bench_sd_step.py  (real TPU, ~10 min of compiles)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu.config import PRESETS
from qdiffusion_tpu.models.unet_ldm import LDMUNet
from qdiffusion_tpu.utils.flops import xla_flops

T0 = time.perf_counter()
LOOP = 10
B = 8  # CFG pair batch for the headline sd_v1 batch-4 task


def log(msg):
    print(f"[sd-step +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def time_step(model, params, x, t, c, tag):
    def step(x, p):
        return model.apply(p, x, t, context=c)

    @jax.jit
    def run(x, p):
        return jnp.sum(jax.lax.fori_loop(
            0, LOOP, lambda i, x: step(x, p).astype(x.dtype), x)
            .astype(jnp.float32))

    def sync(xx):
        return float(run(xx, params))

    log(f"compiling {tag}")
    sync(x); sync(x + 0.002)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter(); sync(x + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    log(f"{tag}: {best*1e3:.2f} ms/step")
    return best, step


def main():
    task = PRESETS["sd_v1"]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4),
                          jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    c = jax.random.normal(jax.random.PRNGKey(2),
                          (B, 77, task.unet_ldm.context_dim), jnp.bfloat16)

    m_flash = LDMUNet(task.unet_ldm)            # auto flash >= 1024 tokens
    params = to_bf16(jax.jit(m_flash.init_params)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    log("params ready (860M)")

    dt_fl, step_fl = time_step(m_flash, params, x, t, c, "flash attn")

    fl = xla_flops(lambda x, p: step_fl(x, p), x, params)
    tflops = fl / dt_fl / 1e12 if fl else float("nan")
    log(f"compiled step FLOPs: {fl/1e9:.1f} GF; flash step at "
        f"{tflops:.1f} TFLOPs/s effective (chip practical peak ~104)")


if __name__ == "__main__":
    main()
