"""Batch-1 weight-bound serving bench: streamed convs vs folded (real TPU).

The stream engine's round-2 gap: convs were fold-only because XLA
materializes conv-weight dequant (PERF_NOTES 'Weight streaming': b64
7.9->10.1 ms, b1 0.86x). Round 3 adds Pallas patch-matmul conv streaming
(ops/qlayers.py::_stream_conv2d) with dequant fused into the VMEM weight
load. This script measures the b1 CIFAR denoise step across engines:

  fp      bf16 baseline
  fold    calibrated integer weights folded to bf16 (reference deployment)
  sd      stream, dense-only (round-2 behaviour)
  sauto8  stream + conv cost model (deployed --stream-convs behaviour)
  sconv8  stream with ALL int8 convs resident in HBM (forced)
  sconv4  stream with ALL int4 (nibble-packed) convs resident in HBM

Usage: python scripts/bench_stream_conv.py [batch ...]     (CIFAR; default 1 8)
       python scripts/bench_stream_conv.py sd [batch ...]  (SD UNet; default 2)
The SD CFG pair for batch-1 serving is a batch-2 UNet call.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

if os.environ.get("QDT_COMPILE_CACHE"):
    # jax is pre-imported by sitecustomize, so JAX_* env vars are dead —
    # but config updates still work (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["QDT_COMPILE_CACHE"])

LOOP = 40
T0 = time.perf_counter()


def log(msg):
    print(f"[+{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def make_runner(step_fn, x, tag):
    @jax.jit
    def run(x):
        return jnp.sum(jax.lax.fori_loop(
            0, LOOP, lambda i, x: step_fn(x).astype(x.dtype), x)
            .astype(jnp.float32))

    def sync(xx):
        return float(run(xx))

    log(f"compiling {tag}")
    sync(x); sync(x + 0.002)

    def rep(i):
        t0 = time.perf_counter()
        sync(x + 0.001 * (i + 3))
        return (time.perf_counter() - t0) / LOOP

    return rep


def bench_batch(B):
    from qdiffusion_tpu.calib.engine import init_weight_qstate
    from qdiffusion_tpu.deploy import make_quantized_step
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, \
        QuantPolicy
    from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

    results = {}
    for wbits, tags in ((8, ("fp", "fold", "sd", "sconv8")),
                        (4, ("sconv4",))):
        policy = QuantPolicy(wq=AffineQuantizerSpec(
            n_bits=wbits, channel_wise=True, channel_axis=-1,
            scale_method="max"))
        model = DDIMUNet(DDIMUNetConfig(), policy)
        params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        qstate = jax.jit(lambda p: init_weight_qstate(model, p))(params)
        jax.block_until_ready(qstate)
        log(f"w{wbits} params+qstate ready")

        x = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 32, 3))
        t = jnp.full((B,), 500.0)

        def to_bf16(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, tree)

        runners = {}
        if "fp" in tags:
            pbf = to_bf16(params)

            def fp_step(x, p=pbf):
                return model.apply(p, x.astype(jnp.bfloat16), t).astype(
                    jnp.float32)

            # params closed over deliberately here (bench-only; small model)
            runners["fp"] = make_runner(fp_step, x, f"b{B} fp")
        if "fold" in tags:
            step = make_quantized_step(model, params, qstate, engine="fold")
            runners["fold"] = make_runner(
                lambda x, s=step: s(x.astype(jnp.bfloat16), t).astype(
                    jnp.float32), x, f"b{B} fold")
        if "sd" in tags:
            step = make_quantized_step(model, params, qstate, engine="stream")
            runners["sd"] = make_runner(
                lambda x, s=step: s(x.astype(jnp.bfloat16), t).astype(
                    jnp.float32), x, f"b{B} stream-dense")
        for key, sc in ((f"sauto{wbits}", True), (f"sconv{wbits}", "all")):
            if key not in tags:
                continue
            step = make_quantized_step(model, params, qstate, engine="stream",
                                       stream_convs=sc)
            runners[key] = make_runner(
                lambda x, s=step: s(x.astype(jnp.bfloat16), t).astype(
                    jnp.float32), x, f"b{B} stream-convs({sc}) w{wbits}")

        best = {k: float("inf") for k in runners}
        for i in range(4):
            for k, rep in runners.items():
                best[k] = min(best[k], rep(i))
        results.update(best)

    fp = results["fp"]
    print(f"\n== batch {B} (ms/step, vs bf16) ==")
    for k, dt in results.items():
        print(f"  {k:8s} {dt * 1e3:8.3f} ms   {fp / dt:6.3f}x")
    return results


def bench_sd(B):
    """SD v1 UNet (860M): the weight-heavy case the conv cost model exists
    for — 1.72 GB bf16 weights, deep 1280-ch convs at 8x8/16x16 latent
    resolutions where the int8/int4 saving dwarfs patch traffic."""
    from qdiffusion_tpu.calib.engine import init_weight_qstate
    from qdiffusion_tpu.config import PRESETS
    from qdiffusion_tpu.deploy import make_quantized_step
    from qdiffusion_tpu.models.unet_ldm import LDMQuantPolicy, LDMUNet
    from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

    from qdiffusion_tpu.deploy import fold_weights, stream_pack_model
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    task = PRESETS["sd_v1"]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4),
                          jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    c = jax.random.normal(jax.random.PRNGKey(2),
                          (B, 77, task.unet_ldm.context_dim), jnp.bfloat16)
    smode = QuantMode(w=False, a=False)

    def time_trees(step, trees, tag):
        # trees as jit ARGUMENTS (closing over the 1.7GB SD tree captures
        # it as program constants — CLAUDE.md; the tiny-CIFAR make_runner
        # above deliberately ignores this)
        @jax.jit
        def run(tr, x):
            return jnp.sum(jax.lax.fori_loop(
                0, LOOP, lambda i, xx: step(tr, xx).astype(xx.dtype), x)
                .astype(jnp.float32))

        def sync(xx):
            return float(run(trees, xx))

        log(f"compiling {tag}")
        sync(x); sync(x + 0.002)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter(); sync(x + 0.001 * (i + 3))
            best = min(best, (time.perf_counter() - t0) / LOOP)
        log(f"{tag}: {best*1e3:.2f} ms/step")
        return best

    results = {}
    for wbits, tags in ((8, ("fp", "fold", "sd", "sauto8")),
                        (4, ("sauto4",))):
        policy = LDMQuantPolicy(wq=AffineQuantizerSpec(
            n_bits=wbits, channel_wise=True, channel_axis=-1,
            scale_method="max"))
        model = LDMUNet(task.unet_ldm, policy)
        params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        qstate = jax.jit(lambda p: init_weight_qstate(model, p))(params)
        jax.block_until_ready(qstate)
        log(f"sd w{wbits} params+qstate ready")

        def fp_step(p, xx):
            return model.apply(p, xx, t, context=c)

        def fold_step(p, xx):
            return model.apply(p, xx, t, context=c)

        def stream_step(tr, xx, conv_mode):
            p, pk = tr
            ctx = QuantCtx(None, mode=smode, engine="stream", packed=pk,
                           conv_stream=conv_mode)
            return model.apply(p, xx, t, ctx, context=c)

        if "fp" in tags:
            pbf = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            results["fp"] = time_trees(fp_step, pbf, f"sd b{B} fp")
            del pbf
        folded = fold_weights(model, params, qstate)
        if "fold" in tags:
            results["fold"] = time_trees(fold_step, folded, f"sd b{B} fold")
        if "sd" in tags:
            pk = stream_pack_model(model, params, qstate)
            results["sd"] = time_trees(
                lambda tr, xx: stream_step(tr, xx, "auto"),
                (folded, pk), f"sd b{B} stream-dense")
        if f"sauto{wbits}" in tags:
            pk = stream_pack_model(model, params, qstate, dense_only=False)
            results[f"sauto{wbits}"] = time_trees(
                lambda tr, xx: stream_step(tr, xx, "auto"),
                (folded, pk), f"sd b{B} stream-convs(auto) w{wbits}")
        del params, qstate, folded
    fp = results["fp"]
    print(f"\n== SD batch {B} (ms/step, vs bf16) ==")
    for k, dt in results.items():
        print(f"  {k:8s} {dt * 1e3:8.3f} ms   {fp / dt:6.3f}x")
    return results


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "sd":
        for B in [int(a) for a in argv[1:]] or [2]:
            bench_sd(B)
    else:
        for B in [int(a) for a in argv] or [1, 8]:
            bench_batch(B)
