"""End-to-end sampling throughput at the reference's headline configs.

The reference's only throughput metric is images/sec per batch, wall
clock over sampler + first-stage decode (sample_diffusion_ldm.py:126-133;
BASELINE.md). This measures the same quantity on one TPU chip for all
four task presets at their reference sampling settings (README.md:41-61),
through the production jitted generate path (serving.make_generate_fn —
identical to what `sample` and `serve` run). Weights are random (no
checkpoints in this environment) — throughput is weight-value-independent.

Usage: python scripts/throughput_headline.py [cifar10|lsun_beds256|
                                              lsun_churches256|sd_v1|all]
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
    # jax is pre-imported by sitecustomize, so JAX_* env vars are dead —
    # but config updates still work (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["QDT_COMPILE_CACHE"])

from qdiffusion_tpu.cli import build_model_and_pipeline
from qdiffusion_tpu.config import PRESETS
from qdiffusion_tpu.serving import make_generate_fn

T0 = time.perf_counter()
BATCH = {"cifar10": 64, "lsun_beds256": 8, "lsun_churches256": 8, "sd_v1": 4}


def log(msg):
    # stderr: bench.py imports this module and must keep stdout to the
    # single JSON line the driver parses
    print(f"[tput +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def bench_task(name):
    task = PRESETS[name]
    batch = BATCH[name]
    model, pipe = build_model_and_pipeline(task)
    params = jax.jit(lambda k: to_bf16(model.init_params(k)))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    vae_params, cond, uncond = None, None, None
    if task.family != "pixel":
        vae_params = jax.jit(lambda k: to_bf16(pipe.vae.init_params(k)))(
            jax.random.PRNGKey(1))
        jax.block_until_ready(vae_params)
    if task.family == "sd":
        # random (77, D) context rows stand in for CLIP outputs: the CFG
        # batching and cost are identical
        dim = task.unet_ldm.context_dim
        cond_row = jax.random.normal(jax.random.PRNGKey(2), (77, dim),
                                     jnp.bfloat16)
        uncond = jax.random.normal(jax.random.PRNGKey(3), (77, dim),
                                   jnp.bfloat16)
        cond = jnp.broadcast_to(cond_row, (batch, 77, dim))
    log(f"{name}: params ready "
        f"({task.sampler.sample_type} {task.sampler.timesteps} steps, "
        f"eta {task.sampler.eta}, batch {batch})")

    gen = make_generate_fn(task, params, vae_params, pipe=pipe, model=model,
                           uncond=uncond)

    def sync(seeds):
        # device->host transfer of the result: block_until_ready does not
        # reliably block over the axon tunnel (CLAUDE.md)
        return float(np.asarray(gen(seeds, cond)).sum())

    t0 = time.perf_counter()
    sync(np.arange(batch, dtype=np.int64))
    log(f"{name}: compile+first batch {time.perf_counter() - t0:.1f}s")
    best = 0.0
    for i in range(3):
        seeds = np.arange(batch, dtype=np.int64) + 1000 * (i + 1)
        t0 = time.perf_counter()
        sync(seeds)
        best = max(best, batch / (time.perf_counter() - t0))
    log(f"{name}: {best:.2f} images/s steady state")
    return best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(BATCH) if which == "all" else [which]
    results = {n: bench_task(n) for n in names}
    log(f"summary: {results}")
