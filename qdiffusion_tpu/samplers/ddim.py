"""Pixel-space DDIM / DDPM sampling loops as single jitted lax.scan programs.

Math parity with reference ddim/functions/denoising.py:10-67
(generalized_steps / ddpm_steps): alpha lookups use the zero-padded beta
cumprod at index t+1 (compute_alpha, denoising.py:4-7). Unlike the
reference — which shuttles every intermediate to CPU per step
(denoising.py:21-30) — the whole trajectory stays in HBM and the loop
compiles to one XLA program, so a 100-step sample is one device execution.

Trajectory capture for timestep-aware calibration: pass
`return_trajectory=True` to collect the exact (x_t, t) model inputs at every
step — the data that reference calibration consumes via get_train_samples
(qdiff/utils.py:325-348).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
ModelFn = Callable[[Array, Array], Array]  # (x_nhwc, t) -> eps


def _alpha_tables(betas: np.ndarray, seq: Sequence[int]):
    """Per-step (a_t, a_next) from the padded cumprod, reversed seq order."""
    padded = np.cumprod(1.0 - np.concatenate([np.zeros(1), betas]))
    seq = list(seq)
    seq_next = [-1] + seq[:-1]
    ts = np.array(list(reversed(seq)), dtype=np.float32)
    at = padded[np.array(list(reversed(seq))) + 1].astype(np.float32)
    at_next = padded[np.array(list(reversed(seq_next))) + 1].astype(np.float32)
    return ts, at, at_next


def ddim_sample(
    model_fn: ModelFn,
    x: Array,
    seq: Sequence[int],
    betas: np.ndarray,
    *,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    return_trajectory: bool = False,
    eval_dtype=None,
) -> Tuple[Array, Optional[dict]]:
    """Generalized DDIM sampling (reference generalized_steps).

    x: NHWC noise; seq: increasing timestep subsequence. Returns the final
    sample and, optionally, the stacked model-input trajectory
    {"xs": [S,B,H,W,C], "ts": [S,B]} in execution order.

    eval_dtype: model-evaluation carrier dtype (bf16 deployment). The
    scheduler update math and scan carry stay f32 (the f32 step tables
    promote the carry regardless of x's dtype); only the UNet input is
    cast down and its eps cast back — without this every deployed model
    call after step 1 runs with f32 activations against bf16 params at
    half MXU rate. None (default) = reference-parity single-dtype flow.
    """
    ts, at, at_next = _alpha_tables(np.asarray(betas, np.float64), seq)
    n = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if eval_dtype is not None:
        x = x.astype(jnp.float32)  # f32 scan carry, stable across steps

    def step(carry, inp):
        xt, key = carry
        t, a, a_next = inp
        tb = jnp.full((n,), t, dtype=jnp.float32)
        et = (model_fn(xt, tb) if eval_dtype is None else
              model_fn(xt.astype(eval_dtype), tb).astype(xt.dtype))
        x0_t = (xt - et * jnp.sqrt(1.0 - a)) / jnp.sqrt(a)
        c1 = eta * jnp.sqrt((1.0 - a / a_next) * (1.0 - a_next) / (1.0 - a))
        c2 = jnp.sqrt((1.0 - a_next) - c1**2)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, xt.shape, xt.dtype)
        xt_next = jnp.sqrt(a_next) * x0_t + c1 * noise + c2 * et
        out = (xt, tb) if return_trajectory else None
        return (xt_next, key), out

    inps = (jnp.asarray(ts), jnp.asarray(at), jnp.asarray(at_next))
    (x_final, _), traj = jax.lax.scan(step, (x, rng), inps)
    if return_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final, None


def ddpm_sample(
    model_fn: ModelFn,
    x: Array,
    seq: Sequence[int],
    betas: np.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    return_trajectory: bool = False,
    eval_dtype=None,
) -> Tuple[Array, Optional[dict]]:
    """Ancestral DDPM sampling (reference ddpm_steps, denoising.py:35-67).

    eval_dtype: see ddim_sample."""
    ts, at, atm1 = _alpha_tables(np.asarray(betas, np.float64), seq)
    n = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if eval_dtype is not None:
        x = x.astype(jnp.float32)

    def step(carry, inp):
        xt, key = carry
        t, a, am1 = inp
        beta_t = 1.0 - a / am1
        tb = jnp.full((n,), t, dtype=jnp.float32)
        e = (model_fn(xt, tb) if eval_dtype is None else
             model_fn(xt.astype(eval_dtype), tb).astype(xt.dtype))
        x0 = jnp.sqrt(1.0 / a) * xt - jnp.sqrt(1.0 / a - 1.0) * e
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            jnp.sqrt(am1) * beta_t * x0
            + jnp.sqrt(1.0 - beta_t) * (1.0 - am1) * xt
        ) / (1.0 - a)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, xt.shape, xt.dtype)
        mask = (t != 0).astype(xt.dtype)
        logvar = jnp.log(beta_t)
        sample = mean + mask * jnp.exp(0.5 * logvar) * noise
        out = (xt, tb) if return_trajectory else None
        return (sample, key), out

    inps = (jnp.asarray(ts), jnp.asarray(at), jnp.asarray(atm1))
    (x_final, _), traj = jax.lax.scan(step, (x, rng), inps)
    if return_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final, None


def inverse_data_transform(x: Array, rescaled: bool = True) -> Array:
    """[-1,1] model space -> [0,1] image space (reference
    ddim/datasets/__init__.py:204-230, rescaled path) with clamp."""
    if rescaled:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)
