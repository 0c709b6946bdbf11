"""Weight-streaming engine benchmark across batch regimes, real TPU.

Measures the bf16 baseline vs the 'stream' deployment (int8 weights in
HBM, dequant fused into the weight load) at:
  * CIFAR UNet batch 64 (compute-bound: expect ~1.0x)
  * CIFAR UNet batch 1  (weight-bound: streaming should win)
  * SD UNet (860M) batch 1/4 CFG-less (serving latency)

Feeds docs/PERF_NOTES.md and bench.py's stream section.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

T0 = time.perf_counter()


def log(msg):
    print(f"[stream +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def time_steps(step_fn, x, *args, tag="", loop=20):
    @jax.jit
    def run(x, *args):
        out = jax.lax.fori_loop(
            0, loop, lambda i, x: step_fn(x, *args).astype(x.dtype), x)
        return jnp.sum(out.astype(jnp.float32))

    def sync(xi):
        return float(run(xi, *args))

    sync(x)
    sync(x + 0.002)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        sync(x + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / loop)
    log(f"{tag}: {best * 1e3:.4f} ms/step")
    return best


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def bench_cifar():
    from qdiffusion_tpu.calib.engine import init_weight_qstate
    from qdiffusion_tpu.deploy import fold_weights, stream_pack_model
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    model = DDIMUNet(DDIMUNetConfig())
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    qstate = jax.jit(lambda p: init_weight_qstate(model, p))(params)
    packed = jax.jit(lambda p, q: stream_pack_model(model, p, q))(params,
                                                                  qstate)
    params16 = jax.jit(
        lambda p, q: to_bf16(fold_weights(model, p, q)))(params, qstate)
    jax.block_until_ready(packed)
    log("cifar params/pack ready")
    t64 = jnp.full((64,), 500.0)
    t1 = jnp.full((1,), 500.0)
    smode = QuantMode(w=False, a=False)

    def base_step(x, p, t):
        return model.apply(p, x.astype(jnp.bfloat16), t).astype(jnp.float32)

    def stream_step(x, p, pk, t):
        ctx = QuantCtx(None, mode=smode, engine="stream", packed=pk)
        return model.apply(p, x.astype(jnp.bfloat16), t, ctx).astype(
            jnp.float32)

    out = {}
    for b, tt, loop in ((64, t64, 20), (1, t1, 200)):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 32, 3))
        bb = time_steps(base_step, x, params16, tt,
                        tag=f"cifar b{b} bf16", loop=loop)
        ss = time_steps(stream_step, x, params16, packed, tt,
                        tag=f"cifar b{b} stream", loop=loop)
        out[f"cifar_b{b}"] = (bb, ss)
        log(f"cifar b{b}: stream_vs_bf16 = {bb / ss:.3f}x")
    return out


def bench_sd():
    from qdiffusion_tpu.calib.engine import init_weight_qstate
    from qdiffusion_tpu.deploy import fold_weights, stream_pack_model
    from qdiffusion_tpu.models.unet_ldm import LDMUNet
    from qdiffusion_tpu.config import SD_V1
    from qdiffusion_tpu.models.unet_ddim import QuantPolicy
    from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    from qdiffusion_tpu.models.unet_ldm import LDMQuantPolicy

    policy = LDMQuantPolicy(wq=AffineQuantizerSpec(
        n_bits=8, channel_wise=True, channel_axis=-1, scale_method="max"))
    model = LDMUNet(SD_V1.unet_ldm, policy)
    params = jax.jit(lambda k: to_bf16(model.init_params(k)))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log("sd params ready")
    qstate = jax.jit(lambda p: init_weight_qstate(model, p))(params)
    packed = jax.jit(lambda p, q: stream_pack_model(model, p, q))(params,
                                                                  qstate)
    params = jax.jit(
        lambda p, q: to_bf16(fold_weights(model, p, q)))(params, qstate)
    jax.block_until_ready(packed)
    log("sd pack ready")
    smode = QuantMode(w=False, a=False)

    def base_step(x, p, t, c):
        return model.apply(p, x.astype(jnp.bfloat16), t,
                           context=c).astype(jnp.float32)

    def stream_step(x, p, pk, t, c):
        ctx = QuantCtx(None, mode=smode, engine="stream", packed=pk)
        return model.apply(p, x.astype(jnp.bfloat16), t, ctx,
                           context=c).astype(jnp.float32)

    out = {}
    for b, loop in ((1, 40), (4, 20)):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
        t = jnp.full((b,), 500.0)
        c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768),
                              jnp.bfloat16)
        bb = time_steps(base_step, x, params, t, c,
                        tag=f"sd b{b} bf16", loop=loop)
        ss = time_steps(stream_step, x, params, packed, t, c,
                        tag=f"sd b{b} stream", loop=loop)
        out[f"sd_b{b}"] = (bb, ss)
        log(f"sd b{b}: stream_vs_bf16 = {bb / ss:.3f}x")
    return out


def bench_dense_chain(n_layers=16, dim=4096, rows=64):
    """Weight-bound dense chain (the serving-shape roofline case in
    docs/PERF_NOTES.md): bf16 weights vs int8 streaming (XLA-fused
    dequant) vs nibble-packed int4 through the Pallas kernel
    (ops/pallas/int4_matmul.py)."""
    import numpy as np

    from qdiffusion_tpu.ops.pallas.int4_matmul import (
        int4_stream_matmul, pack_int4_weight)

    rng = np.random.default_rng(0)
    ws, w8s, scales, shifts, wps, offs = [], [], [], [], [], []
    for i in range(n_layers):
        w = rng.normal(size=(dim, dim)).astype(np.float32) * 0.02
        delta8 = np.abs(w).max(axis=0) / 127.0
        q8 = np.clip(np.round(w / delta8), -128, 127)
        delta4 = np.abs(w).max(axis=0) / 7.0
        q4 = np.clip(np.round(w / delta4), -8, 7)
        ws.append(jnp.asarray(w, jnp.bfloat16))
        w8s.append(jnp.asarray(q8, jnp.int8))
        scales.append(jnp.asarray(delta8, jnp.bfloat16))
        shifts.append(jnp.zeros((dim,), jnp.bfloat16))
        wps.append(pack_int4_weight(jnp.asarray(q4 + 8, jnp.uint8)))
        offs.append((jnp.asarray(delta4, jnp.float32),
                     jnp.asarray(-8.0 * delta4, jnp.float32)))
    x = jnp.asarray(rng.normal(size=(rows, dim)), jnp.bfloat16)

    def chain_bf16(x, ws):
        for w in ws:
            x = jnp.tanh(x @ w)
        return x

    def chain_int8(x, w8s, scales, shifts):
        for w8, sc, sh in zip(w8s, scales, shifts):
            x = jnp.tanh(x @ (w8.astype(jnp.bfloat16) * sc + sh))
        return x

    def chain_int4(x, wps, offs):
        for wp, (sc, off) in zip(wps, offs):
            x = jnp.tanh(int4_stream_matmul(
                x, wp, sc, off, tile_m=min(64, rows),
                tile_n=min(4096, dim), tile_k2=256,
                out_dtype=jnp.bfloat16))
        return x

    b = time_steps(chain_bf16, x, ws, tag=f"dense chain bf16 "
                   f"({n_layers}x{dim}^2, M={rows})", loop=50)
    s8 = time_steps(chain_int8, x, w8s, scales, shifts,
                    tag="dense chain int8-stream", loop=50)
    s4 = time_steps(chain_int4, x, wps, offs,
                    tag="dense chain int4-pallas", loop=50)
    log(f"dense chain: int8 {b / s8:.2f}x, int4-pallas {b / s4:.2f}x vs "
        f"bf16 ({n_layers * dim * dim * 2 / 2**20:.0f} MB bf16 weights)")
    return b, s8, s4


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "cifar"):
        bench_cifar()
    if which in ("all", "sd"):
        bench_sd()
    if which in ("all", "chain"):
        bench_dense_chain()
