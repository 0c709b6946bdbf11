"""Production-scale smoke test on the real chip.

Runs the full-size Stable Diffusion UNet (862M params, 64x64 latents, CFG
batch layout) and an LSUN-beds-size UNet forward on the TPU with random
weights — validates HBM fit, compile, and step latency at deployment scale.

Usage: python scripts/scale_smoke.py [sd|beds|all]
"""

import sys
import time

import jax
import jax.numpy as jnp


def time_step(fn, params, x, *args, n=10, tag=""):
    """Chained-loop timing (the tunnel dedupes repeated identical calls)."""

    @jax.jit
    def run(p, x, *args):
        return jax.lax.fori_loop(
            0, n, lambda i, x: fn(p, x, *args).astype(x.dtype), x)

    def sync_run(x_in):
        # force a device->host transfer of a result-dependent scalar:
        # block_until_ready alone does not reliably block over the tunnel
        out = run(params, x_in, *args)
        return float(jnp.sum(out.astype(jnp.float32)))

    t0 = time.perf_counter()
    sync_run(x)
    print(f"[{tag}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    x2 = x + 0.001  # fresh input: the tunnel caches whole executions
    t0 = time.perf_counter()
    sync_run(x2)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] step: {dt * 1e3:.1f} ms", flush=True)
    return dt


def smoke_sd():
    from qdiffusion_tpu.config import SD_V1
    from qdiffusion_tpu.models.unet_ldm import LDMUNet

    model = LDMUNet(SD_V1.unet_ldm)
    params = jax.jit(lambda k: model.init_params(k, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[sd] params: {n_params/1e6:.0f}M", flush=True)

    B = 4  # CFG pair of 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768), jnp.bfloat16)

    time_step(lambda p, x, t, c: model.apply(p, x, t, context=c),
              params, x, t, c, tag="sd bf16 fwd")


def smoke_beds():
    from qdiffusion_tpu.config import LSUN_BEDS256
    from qdiffusion_tpu.models.unet_ldm import LDMUNet

    model = LDMUNet(LSUN_BEDS256.unet_ldm)
    params = jax.jit(lambda k: model.init_params(k, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[beds] params: {n_params/1e6:.0f}M", flush=True)

    B = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 3), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    time_step(lambda p, x, t: model.apply(p, x, t),
              params, x, t, tag="beds bf16 fwd")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("sd", "all"):
        smoke_sd()
    if which in ("beds", "all"):
        smoke_beds()
