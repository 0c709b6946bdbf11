"""LR-multiplier schedules (reference ldm/lr_scheduler.py), functional.

Pure step -> multiplier functions (use with a base LR of 1.0, e.g. as an
optax schedule via `optax.scale_by_schedule`). The reference's stateful
classes reduce to closed-form math; `last_lr` bookkeeping and print-based
verbosity are dropped — the values match exactly.

  * warmup_cosine: linear warmup then half-cosine decay to lr_min
    (LambdaWarmUpCosineScheduler, :4-33).
  * warmup_cosine_cycles / warmup_linear_cycles: repeated cycles with
    per-cycle warmup/min/max/start (LambdaWarmUpCosineScheduler2, :36-77;
    LambdaLinearScheduler, :80-96 — including its quirk of dividing the
    linear decay by the FULL cycle length, not the post-warmup length).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

__all__ = ["warmup_cosine", "warmup_cosine_cycles", "warmup_linear_cycles"]


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int) -> Callable:
    def schedule(n):
        n = np.asarray(n, np.float64)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = np.minimum((n - warm_up_steps)
                       / (max_decay_steps - warm_up_steps), 1.0)
        decay = lr_min + 0.5 * (lr_max - lr_min) * (1 + np.cos(t * np.pi))
        return np.where(n < warm_up_steps, warm, decay)

    return schedule


def _cycle_of(n, cum_cycles):
    # reference find_in_interval: first cycle whose cumulative end >= n
    return int(np.searchsorted(cum_cycles[1:], n, side="left"))


def _cycles_base(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                 decay: Callable) -> Callable:
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) \
        == len(cycle_lengths)
    cum = np.cumsum([0] + list(cycle_lengths))

    def schedule(n):
        c = _cycle_of(n, cum)
        nn = n - cum[c]
        if nn < warm_up_steps[c]:
            return ((f_max[c] - f_start[c]) / warm_up_steps[c] * nn
                    + f_start[c])
        return decay(nn, c)

    return schedule


def warmup_cosine_cycles(warm_up_steps: Sequence[int], f_min: Sequence[float],
                         f_max: Sequence[float], f_start: Sequence[float],
                         cycle_lengths: Sequence[int]) -> Callable:
    def decay(nn, c):
        t = min((nn - warm_up_steps[c])
                / (cycle_lengths[c] - warm_up_steps[c]), 1.0)
        return f_min[c] + 0.5 * (f_max[c] - f_min[c]) * (1 + np.cos(t * np.pi))

    return _cycles_base(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                        decay)


def warmup_linear_cycles(warm_up_steps: Sequence[int], f_min: Sequence[float],
                         f_max: Sequence[float], f_start: Sequence[float],
                         cycle_lengths: Sequence[int]) -> Callable:
    def decay(nn, c):
        # reference quirk kept: decay fraction over the FULL cycle length
        return f_min[c] + (f_max[c] - f_min[c]) \
            * (cycle_lengths[c] - nn) / cycle_lengths[c]

    return _cycles_base(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                        decay)
