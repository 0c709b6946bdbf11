"""Latent-diffusion samplers: DDIM and PLMS with classifier-free guidance.

Single jitted lax.scan programs with precomputed per-step alpha/sigma tables
(the reference recomputes buffers via register_buffer, ldm ddim.py:25-54;
here `DDIMTables.build` returns plain arrays).

Math parity:
  * DDIM update: reference ldm/models/diffusion/ddim.py:170-220.
  * PLMS Adams-Bashforth orders 1-4 with the pseudo-improved-Euler first
    step (second model eval at t_next): reference plms.py:175-240.
  * CFG batching: one model call on cat([uncond; cond]) then chunk
    (plms.py:181-196) — preserved because calibration data collection
    depends on this exact batch layout.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu.schedules import (
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

Array = jnp.ndarray
# model_fn(x, t, context) -> eps ; context may be None
CondModelFn = Callable[[Array, Array, Optional[Array]], Array]


@dataclasses.dataclass(frozen=True)
class DDIMTables:
    """Per-step sampler tables, index 0 = lowest timestep."""

    timesteps: np.ndarray  # [S] the +1-shifted ddim timesteps
    alphas: np.ndarray  # [S]
    alphas_prev: np.ndarray
    sqrt_one_minus_alphas: np.ndarray
    sigmas: np.ndarray

    @classmethod
    def build(cls, alphas_cumprod: np.ndarray, num_steps: int, eta: float,
              discr_method: str = "uniform") -> "DDIMTables":
        ts = make_ddim_timesteps(discr_method, num_steps,
                                 len(alphas_cumprod))
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            alphas_cumprod, ts, eta)
        return cls(ts, alphas, alphas_prev, np.sqrt(1.0 - alphas), sigmas)


def _cfg_eps(model_fn: CondModelFn, x: Array, t: Array,
             cond: Optional[Array], uncond: Optional[Array],
             scale: float) -> Array:
    if cond is None or uncond is None or scale == 1.0:
        return model_fn(x, t, cond)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = jnp.concatenate([uncond, cond], axis=0)
    e = model_fn(x_in, t_in, c_in)
    e_uncond, e_cond = jnp.split(e, 2, axis=0)
    return e_uncond + scale * (e_cond - e_uncond)


def _x_prev(x: Array, e_t: Array, a_t, a_prev, sqrt_1m_a, sigma,
            noise: Array) -> Tuple[Array, Array]:
    pred_x0 = (x - sqrt_1m_a * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise, pred_x0


def _device_tables(tables: DDIMTables):
    """Numpy -> device arrays (f32) for traced per-step indexing."""
    to = lambda a: jnp.asarray(a, jnp.float32)
    return (to(tables.alphas), to(tables.alphas_prev),
            to(tables.sqrt_one_minus_alphas), to(tables.sigmas))


def ddim_sample_ldm(
    model_fn: CondModelFn,
    x: Array,
    tables: DDIMTables,
    *,
    cond: Optional[Array] = None,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
    eta_noise: bool = True,
    rng: Optional[jax.Array] = None,
    return_trajectory: bool = False,
    eval_dtype=None,
):
    """LDM DDIM sampling loop (reference ddim_sampling, ddim.py:116-167).

    eval_dtype: model-evaluation carrier (bf16 deployment) — the f32 step
    tables promote the scan carry to f32, so without the cast every model
    call after step 1 runs f32 activations against bf16 params at half
    MXU rate. Scheduler math stays f32; None = reference-parity flow
    (see samplers/ddim.py::ddim_sample)."""
    S = len(tables.timesteps)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if eval_dtype is not None:
        x = x.astype(jnp.float32)  # f32 scan carry, stable across steps
    steps = jnp.asarray(np.flip(tables.timesteps).copy(), jnp.float32)
    idxs = jnp.asarray(np.arange(S)[::-1].copy())
    t_alphas, t_alphas_prev, t_sqrt1m, t_sigmas = _device_tables(tables)

    def step(carry, inp):
        xt, key = carry
        t_step, index = inp
        tb = jnp.full((x.shape[0],), t_step, jnp.float32)
        e_t = (_cfg_eps(model_fn, xt, tb, cond, uncond, guidance_scale)
               if eval_dtype is None else
               _cfg_eps(model_fn, xt.astype(eval_dtype), tb, cond, uncond,
                        guidance_scale).astype(xt.dtype))
        key, sub = jax.random.split(key)
        noise = (jax.random.normal(sub, xt.shape, xt.dtype)
                 if eta_noise else jnp.zeros_like(xt))
        x_new, pred_x0 = _x_prev(
            xt, e_t, t_alphas[index], t_alphas_prev[index],
            t_sqrt1m[index], t_sigmas[index], noise)
        out = (xt, tb) if return_trajectory else None
        return (x_new, key), out

    (x_final, _), traj = jax.lax.scan(step, (x, rng), (steps, idxs))
    if return_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final, None


def plms_sample(
    model_fn: CondModelFn,
    x: Array,
    tables: DDIMTables,
    *,
    cond: Optional[Array] = None,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
    rng: Optional[jax.Array] = None,
    return_trajectory: bool = False,
    eval_dtype=None,
):
    """PLMS sampling (reference plms_sampling / p_sample_plms).

    eval_dtype: model-evaluation carrier dtype (see ddim_sample_ldm) —
    eps history and Adams-Bashforth combines stay f32.

    The carry holds the last 3 eps values plus a step counter; the order-k
    Adams-Bashforth combine is selected by lax.switch. Step 0 performs the
    pseudo-improved-Euler second model evaluation at t_next under lax.cond,
    so later steps pay only one UNet call.

    Trajectory capture records (x_t, t) and, for conditional runs, is
    combined by the caller with (cond, uncond) — the SD calibration-data
    hook (reference plms.py:134, 166-171).
    """
    S = len(tables.timesteps)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if eval_dtype is not None:
        x = x.astype(jnp.float32)  # f32 scan carry + eps history
    time_range = np.flip(tables.timesteps).copy()
    t_next_range = np.append(time_range[1:], time_range[-1])
    idxs = np.arange(S)[::-1].copy()
    t_alphas, t_alphas_prev, t_sqrt1m, t_sigmas = _device_tables(tables)

    def get_eps(xc, tb):
        if eval_dtype is None:
            return _cfg_eps(model_fn, xc, tb, cond, uncond, guidance_scale)
        return _cfg_eps(model_fn, xc.astype(eval_dtype), tb, cond, uncond,
                        guidance_scale).astype(xc.dtype)

    def xprev(xt, e, index):
        return _x_prev(xt, e, t_alphas[index], t_alphas_prev[index],
                       t_sqrt1m[index], t_sigmas[index], jnp.zeros_like(xt))

    def step(carry, inp):
        xt, old, count = carry  # old: (3, B, ...) most-recent-first
        t_step, t_next, index = inp
        b = x.shape[0]
        tb = jnp.full((b,), t_step, jnp.float32)
        e_t = get_eps(xt, tb)

        def order1(_):
            # second eval at (x_prev, t_next): pseudo improved Euler
            x_prev, _ = xprev(xt, e_t, index)
            tnb = jnp.full((b,), t_next, jnp.float32)
            e_next = get_eps(x_prev, tnb)
            return (e_t + e_next) / 2

        def order2(_):
            return (3 * e_t - old[0]) / 2

        def order3(_):
            return (23 * e_t - 16 * old[0] + 5 * old[1]) / 12

        def order4(_):
            return (55 * e_t - 59 * old[0] + 37 * old[1] - 9 * old[2]) / 24

        e_prime = jax.lax.switch(jnp.minimum(count, 3),
                                 [order1, order2, order3, order4], None)
        x_new, _ = xprev(xt, e_prime, index)
        new_old = jnp.stack([e_t, old[0], old[1]])
        out = (xt, tb) if return_trajectory else None
        return (x_new, new_old, count + 1), out

    old0 = jnp.stack([jnp.zeros_like(x)] * 3)
    inps = (jnp.asarray(time_range, jnp.float32),
            jnp.asarray(t_next_range, jnp.float32), jnp.asarray(idxs))
    (x_final, _, _), traj = jax.lax.scan(step, (x, old0, 0), inps)
    if return_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final, None
