"""Calibration throughput on the real chip.

Modes (argv[1], default 'block'):
  block    — one full-size CIFAR-UNet block reconstructed at reference
             settings (20k Adam iters, batch 32, 512-sample cache) — the
             loop the reference runs as 20k Python steps per block.
  pipeline — first N units calibrated synchronously (per-unit
             block_until_ready) vs pipelined (free-running async dispatch:
             unit N+1's capture/recon trace+compile overlaps unit N's
             device execution; CalibConfig.pipeline semantics).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
from qdiffusion_tpu.calib.engine import init_weight_qstate
from qdiffusion_tpu.calib.capture import capture_unit_io
from qdiffusion_tpu.calib.recon import ReconConfig, reconstruct_unit

model = DDIMUNet(DDIMUNetConfig())  # full CIFAR architecture
params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
jax.block_until_ready(params)
qstate0 = jax.jit(lambda p: init_weight_qstate(model, p))(params)
jax.block_until_ready(qstate0)
print("init done", flush=True)


def bench_block():
    xs = jax.random.normal(jax.random.PRNGKey(1), (512, 32, 32, 3))
    ts = jnp.asarray(jnp.linspace(0, 999, 512))
    qstate = qstate0
    for unit_name in ["down.0.block.0", "mid.attn_1"]:
        unit = next(u for u in model.units if u.name == unit_name)
        t0 = time.time()
        inps, out = capture_unit_io(model, params, qstate, unit.name, xs, ts,
                                    asym=True, batch_size=64)
        jax.block_until_ready(out)
        t_cap = time.time() - t0
        cfg = ReconConfig(iters=20000, batch_size=32)
        t0 = time.time()
        qstate = reconstruct_unit(model, params, qstate, unit, inps, out, cfg,
                                  act_quant=False)
        jax.block_until_ready(qstate[unit.layer_names[0]]["w"]["alpha"])
        t_rec = time.time() - t0
        print(f"{unit_name}: capture {t_cap:.1f}s | 20k-iter AdaRound "
              f"{t_rec:.1f}s ({20000 / t_rec:.0f} iters/s)", flush=True)

    n_units = len(model.units)
    print(f"({n_units} units total in the CIFAR UNet)", flush=True)


def bench_pipeline(sync: bool, n_units=6, iters=4000):
    """One COLD-cache calibration pass over the first n_units. Run each
    variant in its own process (in-process jit caches would hide the
    compile overlap that pipelining buys):
        python scripts/calib_bench.py pipeline-sync
        python scripts/calib_bench.py pipeline-async
    """
    xs = jax.random.normal(jax.random.PRNGKey(1), (128, 32, 32, 3))
    ts = jnp.asarray(jnp.linspace(0, 999, 128))
    units = [u for u in model.units if u.layer_names][:n_units]
    cfg = ReconConfig(iters=iters, batch_size=32)

    qstate = qstate0
    t0 = time.time()
    for unit in units:
        inps, out = capture_unit_io(model, params, qstate, unit.name,
                                    xs, ts, asym=True, batch_size=64)
        qstate = reconstruct_unit(model, params, qstate, unit, inps,
                                  out, cfg, act_quant=False)
        if sync:
            jax.block_until_ready(qstate[unit.layer_names[0]]["w"]["delta"])
    jax.block_until_ready(qstate)
    mode = "synchronous" if sync else "pipelined"
    print(f"{mode} cold pass: {time.time() - t0:.1f}s for {n_units} units "
          f"x {iters} iters", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "block"
    if which == "block":
        bench_block()
    elif which == "pipeline-sync":
        bench_pipeline(sync=True)
    elif which == "pipeline-async":
        bench_pipeline(sync=False)
    else:
        raise SystemExit(f"unknown mode {which}")
