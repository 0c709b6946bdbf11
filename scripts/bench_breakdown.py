"""Where does the CIFAR UNet step time go? Ablation breakdown on real TPU.

Times the full bf16 step, then variants with GroupNorm statistics removed
(affine-only), swish removed, and attention removed — isolating the
elementwise/normalization tail from the conv (MXU) floor. Also measures
the achievable matmul rate at the model's dominant conv shape to anchor
the roofline. Feeds docs/PERF_NOTES.md.

Usage: python scripts/bench_breakdown.py  (real TPU; ~10 min of compiles)
"""

import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu import nn
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig

BATCH = 64
IMG = 32
LOOP = 20


def log(msg):
    print(f"[breakdown +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def time_steps(step_fn, x, *args, tag="", loop=LOOP):
    @jax.jit
    def run(x, *args):
        out = jax.lax.fori_loop(
            0, loop, lambda i, x: step_fn(x, *args).astype(x.dtype), x)
        return jnp.sum(out.astype(jnp.float32))

    def vary(x, i):  # cache-busting input variation, dtype-safe
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x + jnp.asarray(i, x.dtype)
        return x + 0.001 * i

    def sync(x_in):
        return float(run(x_in, *args))

    sync(x)
    sync(vary(x, 2))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        sync(vary(x, i + 3))
        best = min(best, (time.perf_counter() - t0) / loop)
    log(f"{tag}: {best * 1e3:.3f} ms/step (loop={loop})")
    return best


def main():
    model = DDIMUNet(DDIMUNetConfig())
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    to_bf16 = lambda tree: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)
    params = to_bf16(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, IMG, IMG, 3))
    t = jnp.full((BATCH,), 500.0)
    log("params ready")

    def step(x, p):
        return model.apply(p, x.astype(jnp.bfloat16), t).astype(jnp.float32)

    results = {}
    results["full"] = time_steps(step, x, params, tag="full bf16")

    # -- GroupNorm stats removed: affine only (keeps dtype casts) ---------
    real_gn, real_swish = nn.group_norm, nn.swish

    def affine_only(x, scale, bias, *, num_groups=32, eps=1e-6):
        return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)

    nn.group_norm = affine_only
    results["no_norm_stats"] = time_steps(step, x, params,
                                          tag="norm stats removed")

    # -- swish removed too -------------------------------------------------
    nn.swish = lambda x: x
    results["no_norm_no_swish"] = time_steps(step, x, params,
                                             tag="+ swish removed")

    # -- norms fully removed (no fp32 casts either) -----------------------
    nn.group_norm = lambda x, s, b, **kw: x
    results["no_elementwise"] = time_steps(step, x, params,
                                           tag="+ norm affine/casts removed")
    nn.group_norm, nn.swish = real_gn, real_swish

    # -- conv floor: the model's dominant conv shape, chained -------------
    # 128-ch 3x3 at 32x32 and 16x16, plus a big matmul anchor
    for hw, ch in ((32, 128), (16, 256)):
        xx = jax.random.normal(jax.random.PRNGKey(2),
                               (BATCH, hw, hw, ch), jnp.bfloat16)
        ww = jax.random.normal(jax.random.PRNGKey(3),
                               (3, 3, ch, ch), jnp.bfloat16) * 0.02

        def conv_step(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        dt = time_steps(conv_step, xx, ww, tag=f"conv {hw}x{hw}x{ch}", loop=300)
        macs = BATCH * hw * hw * 9 * ch * ch
        log(f"  -> {2 * macs / dt / 1e12:.1f} TFLOPs")
        results[f"conv_{hw}_{ch}_tflops"] = 2 * macs / dt / 1e12

    # int8 conv rate at the same shape
    xx8 = (jax.random.normal(jax.random.PRNGKey(2),
                             (BATCH, 32, 32, 128)) * 30).astype(jnp.int8)
    ww8 = (jax.random.normal(jax.random.PRNGKey(3),
                             (3, 3, 128, 128)) * 30).astype(jnp.int8)

    def conv8_step(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)  # requantize-ish, keep int8 carrier

    dt8 = time_steps(conv8_step, xx8, ww8, tag="conv int8 32x32x128", loop=300)
    macs = BATCH * 32 * 32 * 9 * 128 * 128
    log(f"  -> {2 * macs / dt8 / 1e12:.1f} TOPs")
    results["conv_int8_tops"] = 2 * macs / dt8 / 1e12

    print("\n==== breakdown ====")
    full = results["full"]
    for k, v in results.items():
        if k.endswith("tflops") or k.endswith("tops"):
            print(f"{k:24s} {v:8.1f}")
        else:
            print(f"{k:24s} {v * 1e3:8.3f} ms  ({v / full * 100:5.1f}%)")


if __name__ == "__main__":
    main()
