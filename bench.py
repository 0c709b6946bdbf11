"""Headline benchmark: quantized UNet denoise-step throughput on one chip.

Prints ONE JSON line:
  {"metric": "quant_unet_steps_per_sec", "value": N, "unit": "...",
   "vs_baseline": R}

vs_baseline = quantized-step throughput / full-precision bf16 step
throughput on the same chip (reference baseline is the fp16 GPU UNet step;
BASELINE.md north star: >=2x via real int8 kernels).

Timing methodology: N chained UNet steps inside one jitted lax.fori_loop
(feeding the eps output back as the next input) — avoids dispatch caching
and measures steady-state device throughput, like a sampler loop.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 64
IMG = 32
LOOP = 20
VERBOSE = os.environ.get("BENCH_VERBOSE", "0") == "1"


def log(msg):
    if VERBOSE:
        print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}",
              file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def time_steps(step_fn, x, t, tag=""):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, LOOP, lambda i, x: step_fn(x, t), x)

    log(f"compiling {tag}")
    jax.block_until_ready(run(x))  # compile + warm
    log(f"compiled {tag}")
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / LOOP


def main():
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
    from qdiffusion_tpu.calib.engine import init_act_qstate, init_weight_qstate
    from qdiffusion_tpu.deploy import make_quantized_step

    model = DDIMUNet(DDIMUNetConfig())  # full CIFAR-10 architecture
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, IMG, IMG, 3))
    t = jnp.full((BATCH,), 500.0)

    # full-precision bf16 baseline
    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def fp_step(x, t):
        return model.apply(params_bf16, x.astype(jnp.bfloat16), t).astype(
            jnp.float32)

    fp_dt = time_steps(fp_step, x, t, "bf16 baseline")
    log(f"fp_dt {fp_dt * 1e3:.2f} ms")

    # quantized W8A8 integer path
    qstate = init_weight_qstate(model, params)
    log("weight qstate done")
    qstate = init_act_qstate(model, params, qstate, x[:8], t[:8])
    log("act qstate done")
    quant_step = make_quantized_step(model, params, qstate, engine="int8")

    q_dt = time_steps(quant_step, x, t, "int8 quant step")
    log(f"q_dt {q_dt * 1e3:.2f} ms")

    print(json.dumps({
        "metric": "quant_unet_steps_per_sec",
        "value": round(1.0 / q_dt, 3),
        "unit": f"steps/s (W8A8 int8, batch {BATCH}, 32x32)",
        "vs_baseline": round(fp_dt / q_dt, 4),
    }))


if __name__ == "__main__":
    main()
