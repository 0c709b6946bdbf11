"""SD CFG-step per-slice breakdown via op ablations (real TPU).

The round-2 gap: the SD UNet CFG step ran at ~68 TFLOPs effective vs the
93-96 TFLOPs conv roofline with no per-slice account of the missing third.
This script times the full-size SD v1 UNet step (batch 8 = the CFG pair of
the headline batch-4 task) and shape-preserving ablations that remove one
op family at a time — the deltas attribute the step time:

  full         bf16 step, flash attention on (deployed configuration)
  gn_affine    GroupNorm -> affine only (statistics removed)
  ln_affine    LayerNorm -> affine only
  act_id       swish/gelu -> identity
  attn_skip    self-attention (flash) -> value passthrough
  ctx1         context length 77 -> 1 (cross-attention dots ~vanish)
  mat_attn     flash dispatch off (materializing attention baseline)

Each ablation changes ONLY the targeted math; tensor shapes (and thus
every other op) are untouched. Deltas overlap slightly (XLA refuses/gains
fusions differently per variant) — treat as attribution, not exact sums.

Usage: python scripts/bench_sd_ablation.py  (~15 min of remote compiles)
"""

import contextlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn
from qdiffusion_tpu.config import SD_V1
from qdiffusion_tpu.models.unet_ldm import LDMUNet
from qdiffusion_tpu.ops import attention as attn_mod

B = 8
LOOP = 10
T0 = time.perf_counter()


def log(msg):
    print(f"[sd-abl +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


@contextlib.contextmanager
def patched(obj, name, fn):
    orig = getattr(obj, name)
    setattr(obj, name, fn)
    try:
        yield
    finally:
        setattr(obj, name, orig)


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
    log(f"{tag:10s} {best * 1e3:8.2f} ms/step")
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

    res = {}
    res["full"] = timed(model, params, x, t, c, "full")

    def gn_affine(xx, scale, bias, *, num_groups=32, eps=1e-6):
        return (xx.astype(jnp.float32) * scale + bias).astype(xx.dtype)

    with patched(nn, "group_norm", gn_affine):
        res["gn_affine"] = timed(model, params, x, t, c, "gn_affine")

    def ln_affine(xx, scale, bias, *, eps=1e-5):
        return (xx.astype(jnp.float32) * scale + bias).astype(xx.dtype)

    with patched(nn, "layer_norm", ln_affine):
        res["ln_affine"] = timed(model, params, x, t, c, "ln_affine")

    ident = lambda xx: xx
    with patched(nn, "swish", ident), patched(nn, "gelu", ident):
        res["act_id"] = timed(model, params, x, t, c, "act_id")

    def attn_skip(q, k, v, **kw):
        return v[:, : q.shape[1]] if v.shape[1] >= q.shape[1] else q

    with patched(attn_mod, "blockwise_attention", attn_skip):
        res["attn_skip"] = timed(model, params, x, t, c, "attn_skip")

    res["ctx1"] = timed(model, params, x, t, c[:, :1], "ctx1")

    mat = LDMUNet(SD_V1.unet_ldm, flash_threshold=0)
    res["mat_attn"] = timed(mat, params, x, t, c, "mat_attn")

    full = res["full"]
    print("\n== SD UNet CFG step, batch 8, 64x64 latents (ms) ==")
    print(f"  full step            {full * 1e3:8.2f}")
    for key, label in [("gn_affine", "GroupNorm statistics"),
                       ("ln_affine", "LayerNorm statistics"),
                       ("act_id", "swish+gelu"),
                       ("attn_skip", "self-attn (flash)"),
                       ("ctx1", "cross-attn dots")]:
        d = full - res[key]
        print(f"  {label:20s} {d * 1e3:8.2f}  ({100 * d / full:4.1f}%)")
    print(f"  materializing attn   {res['mat_attn'] * 1e3:8.2f} "
          f"({res['mat_attn'] / full:.2f}x of full)")


if __name__ == "__main__":
    main()
