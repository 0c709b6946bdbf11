"""Batch-1 weight-bound serving bench: streamed convs vs folded (real TPU).

The stream engine's round-2 gap: convs were fold-only because XLA
materializes conv-weight dequant (PERF_NOTES 'Weight streaming': b64
7.9->10.1 ms, b1 0.86x). Round 3 adds Pallas patch-matmul conv streaming
(ops/qlayers.py::_stream_conv2d) with dequant fused into the VMEM weight
load. This script measures the b1 CIFAR denoise step across engines:

  fp      bf16 baseline
  fold    calibrated integer weights folded to bf16 (reference deployment)
  sd      stream, dense-only (round-2 behaviour)
  sconv8  stream with int8 convs resident in HBM
  sconv4  stream with int4 (nibble-packed) convs resident in HBM

Usage: python scripts/bench_stream_conv.py [batch ...]  (default: 1 8)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

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
        key = f"sconv{wbits}"
        if key in tags:
            step = make_quantized_step(model, params, qstate, engine="stream",
                                       stream_convs="all")
            runners[key] = make_runner(
                lambda x, s=step: s(x.astype(jnp.bfloat16), t).astype(
                    jnp.float32), x, f"b{B} stream-convs w{wbits}")

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


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    for B in batches:
        bench_batch(B)
