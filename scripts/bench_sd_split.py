"""Split the SD headline batch time: PLMS sampler loop vs VAE decode.

The headline metric (throughput_headline.py) jits sampler scan + decode as
one program; this times them separately at the same batch to show where
the non-UNet time goes and what decode optimization could buy.

Usage: QDT_COMPILE_CACHE=... python scripts/bench_sd_split.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("QDT_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["QDT_COMPILE_CACHE"])

from qdiffusion_tpu.cli import build_model_and_pipeline
from qdiffusion_tpu.config import PRESETS

T0 = time.perf_counter()
B = 4


def log(msg):
    print(f"[sd-split +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def main():
    task = PRESETS["sd_v1"]
    model, pipe = build_model_and_pipeline(task)
    params = jax.jit(lambda k: to_bf16(model.init_params(k)))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    vae_params = jax.jit(lambda k: to_bf16(pipe.vae.init_params(k)))(
        jax.random.PRNGKey(1))
    jax.block_until_ready(vae_params)
    dim = task.unet_ldm.context_dim
    cond = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(2), (77, dim), jnp.bfloat16),
        (B, 77, dim))
    uncond = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(3), (77, dim), jnp.bfloat16),
        (B, 77, dim))
    log("params ready")

    @jax.jit
    def sample_only(p, x0, c, uc):
        z, _ = pipe.sample(p, None, B, sampler="plms", steps=50,
                           latent_size=64, latent_channels=4,
                           cond=c, uncond=uc, guidance_scale=7.5,
                           x_init=x0, decode=False,
                           eval_dtype=jnp.bfloat16)
        return z

    @jax.jit
    def decode_only(vp, z):
        img = pipe.decode_first_stage(vp, z.astype(jnp.bfloat16))
        return jnp.clip((img.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

    x0 = jax.random.normal(jax.random.PRNGKey(4), (B, 64, 64, 4))

    def sync(fn, *a):
        return float(np.asarray(jax.tree_util.tree_leaves(fn(*a))[0],
                                np.float32).sum())

    t0 = time.perf_counter(); z = sample_only(params, x0, cond, uncond)
    sync(lambda: z)
    log(f"sampler compile+run {time.perf_counter() - t0:.1f}s")
    best_s = float("inf")
    for i in range(3):
        xi = x0 + 0.001 * (i + 1)
        t0 = time.perf_counter()
        z = sample_only(params, xi, cond, uncond); sync(lambda: z)
        best_s = min(best_s, time.perf_counter() - t0)
    log(f"PLMS-50 sampler only (b{B}): {best_s:.2f}s "
        f"({best_s / 50 * 1e3:.1f} ms/step incl. CFG pair)")

    t0 = time.perf_counter(); img = decode_only(vae_params, z)
    sync(lambda: img)
    log(f"decode compile+run {time.perf_counter() - t0:.1f}s")
    best_d = float("inf")
    for i in range(3):
        zi = z + 0.001 * (i + 1)
        t0 = time.perf_counter()
        img = decode_only(vae_params, zi); sync(lambda: img)
        best_d = min(best_d, time.perf_counter() - t0)
    log(f"VAE decode 64->512^2 (b{B}): {best_d:.2f}s")
    log(f"sampler {best_s:.2f}s + decode {best_d:.2f}s = "
        f"{best_s + best_d:.2f}s -> {B / (best_s + best_d):.2f} img/s")


if __name__ == "__main__":
    main()
