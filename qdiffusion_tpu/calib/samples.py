"""Timestep-aware calibration sample selection.

Equivalent of reference get_train_samples (qdiff/utils.py:325-348): slice a
saved sampling trajectory at `cali_st` evenly-spaced steps, take `cali_n`
samples at each, and (conditional case) concatenate the cond and uncond
trajectories back-to-back.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def get_train_samples(
    trajectory: dict,
    cali_n: int,
    cali_st: int,
    cond: bool = False,
):
    """trajectory: {"xs": [S,B,...], "ts": [S,B]} (+ "cs"/"ucs" [S,B,T,D])."""
    xs, ts = trajectory["xs"], trajectory["ts"]
    nsteps = xs.shape[0]
    if cali_st == 1:
        cali_xs = xs.reshape(-1, *xs.shape[2:])[:cali_n]
        cali_ts = jnp.full((cali_n,), 800.0, xs.dtype)
        return cali_xs, cali_ts
    assert nsteps >= cali_st, f"trajectory has {nsteps} < {cali_st} steps"
    idx = np.arange(0, nsteps, nsteps // cali_st)
    xs_sel = xs[idx, :cali_n]  # (st, n, ...)
    ts_sel = ts[idx, :cali_n]
    cali_xs = xs_sel.reshape(-1, *xs_sel.shape[2:])
    cali_ts = ts_sel.reshape(-1)
    if cond:
        cs = trajectory["cs"][idx, :cali_n]
        ucs = trajectory["ucs"][idx, :cali_n]
        cali_xs = jnp.concatenate([cali_xs, cali_xs], axis=0)
        cali_ts = jnp.concatenate([cali_ts, cali_ts], axis=0)
        conds = jnp.concatenate(
            [cs.reshape(-1, *cs.shape[2:]), ucs.reshape(-1, *ucs.shape[2:])], axis=0)
        return cali_xs, cali_ts, conds
    return cali_xs, cali_ts
