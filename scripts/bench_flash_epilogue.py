"""One-off: isolate the cost of each quant-epilogue component in the
Pallas flash kernel at the SD 4096-token shape. Variants toggle individual
ops; the deltas localize the VPU cost. Not part of the test suite."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(scal_ref, q_ref, k_ref, v_ref, o_ref, *, scale, mode):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    linv = 1.0 / jnp.sum(e, axis=1, keepdims=True)
    v = v_ref[0]
    d = scal_ref[0, 0]
    inv_d = 1.0 / d

    if mode == "fp_postnorm":  # normalize after dot
        o = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = (o * linv).astype(o_ref.dtype)
        return
    p = e * linv
    if mode == "fp_prenorm":
        pass
    elif mode == "cast_rt":
        p = p.astype(jnp.bfloat16).astype(jnp.float32)
    elif mode == "mul_only":
        p = p * inv_d
    elif mode == "floor_half":
        p = jnp.floor(p * inv_d + 0.5)
    elif mode == "round_only":
        p = jnp.round(p * inv_d)
    elif mode == "round_clip":
        p = jnp.minimum(jnp.round(p * inv_d), 255.0)
    elif mode == "full":
        p = jnp.minimum(jnp.round(p * inv_d), 255.0) * d
    elif mode == "full_floor":
        p = jnp.minimum(jnp.floor(p * inv_d + 0.5), 255.0) * d
    o_ref[0] = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash(q, k, v, scale, mode, tile_q=128):
    B, T, H, D = q.shape
    S = k.shape[1]

    def to_bhd(x, L):
        return jnp.moveaxis(x, 2, 1).reshape(B * H, L, x.shape[-1])

    qf, kf, vf = to_bhd(q, T), to_bhd(k, S), to_bhd(v, S)
    Dp = _round_up(D, 128)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, Dp - D)))
    kf = jnp.pad(kf, ((0, 0), (0, 0), (0, Dp - D)))
    vf = jnp.pad(vf, ((0, 0), (0, 0), (0, Dp - D)))
    scalars = jnp.full((1, 4), 1 / 255.0, jnp.float32)
    kern = functools.partial(_kernel, scale=scale, mode=mode)
    out = pl.pallas_call(
        kern,
        grid=(B * H, T // tile_q),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_q, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, Dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, Dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
    )(scalars, qf, kf, vf)
    return jnp.moveaxis(out.reshape(B, H, T, Dp)[..., :D], 1, 2)


def time_fn(fn, q, k, v, tag="", loop=30):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = fn(q, k, v)
            return q + 0.001 * o.astype(q.dtype)
        return jnp.sum(jax.lax.fori_loop(0, loop, body, q).astype(jnp.float32))

    def sync(qq):
        return float(run(qq, k, v))

    sync(q); sync(q + 0.002)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter(); sync(q + 0.001 * (i + 3))
        best = min(best, (time.perf_counter() - t0) / loop)
    print(f"{tag}: {best*1e3:.4f} ms", flush=True)
    return best


B, T, H, D = 2, 4096, 8, 40
q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16)
scale = D ** -0.5

for mode in ["fp_postnorm", "fp_prenorm", "cast_rt", "mul_only", "floor_half",
             "round_only", "round_clip", "full", "full_floor"]:
    time_fn(lambda q, k, v, m=mode: flash(q, k, v, scale, m), q, k, v,
            tag=mode)
