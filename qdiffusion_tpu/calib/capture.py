"""Block input/output capture over the calibration set.

Replaces the reference forward-hook + StopForwardException machinery
(qdiff/utils.py:18-149, 186-255): the model forward records the target
unit's (input, output) into the QuantCtx, the jitted capture function
returns only the captured arrays, and XLA dead-code-eliminates everything
downstream of the block — the functional equivalent of truncating the
forward.

asym capture (AdaRound asymmetric reconstruction, utils.py:235-243): the
input is re-captured with the whole network weight-quantized (prefix blocks
already hard-AdaRounded), the output stays full-precision.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

Array = jnp.ndarray


def capture_unit_io(
    model,
    params: dict,
    qstate: dict,
    unit_name: str,
    cali_xs: Array,
    cali_ts: Array,
    cali_cs: Optional[Array] = None,
    *,
    asym: bool = False,
    act_quant: bool = False,
    batch_size: int = 8,
):
    """Cache (inputs, outputs) of `unit_name` over the calibration set.

    Returns (inps, out): inps is a tuple of stacked arrays (one per block
    input, e.g. (x, temb)), out a stacked array. Batch iteration happens on
    the host; each batch is one jitted capture call (same trace reused).
    """

    def fwd(p, q, x, t, c, mode: QuantMode, want_out: bool):
        ctx = QuantCtx(q, mode=mode, capture=unit_name)
        if c is None:
            model.apply(p, x, t, ctx)
        else:
            model.apply(p, x, t, ctx, context=c)
        cap = ctx.captured[unit_name]
        inp = cap["inp"] if isinstance(cap["inp"], tuple) else (cap["inp"],)
        return (inp, cap["out"]) if want_out else inp

    fp_mode = QuantMode.off()
    q_mode = QuantMode(w=True, a=act_quant, soft=False)

    fp_cap = jax.jit(partial(fwd, mode=fp_mode, want_out=True))
    asym_cap = jax.jit(partial(fwd, mode=q_mode, want_out=False)) if asym else None

    n = cali_xs.shape[0]
    if n % batch_size:
        # matches the reference's integer-batch loop (qdiff/utils.py:
        # get_train_samples consumers iterate whole batches), but never
        # silently: the tail samples do not enter the calibration cache.
        import logging

        logging.getLogger(__name__).warning(
            "capture_unit_io: dropping tail batch of %d sample(s) "
            "(n=%d not divisible by batch_size=%d)",
            n % batch_size, n, batch_size)
    inps_acc, out_acc = None, []
    for i in range(0, n - batch_size + 1, batch_size):
        x = cali_xs[i : i + batch_size]
        t = cali_ts[i : i + batch_size]
        c = cali_cs[i : i + batch_size] if cali_cs is not None else None
        inp, out = fp_cap(params, qstate, x, t, c)
        if asym:
            inp = asym_cap(params, qstate, x, t, c)
        if inps_acc is None:
            inps_acc = [[] for _ in inp]
        for acc, a in zip(inps_acc, inp):
            acc.append(a)
        out_acc.append(out)
    inps = tuple(jnp.concatenate(acc, axis=0) for acc in inps_acc)
    out = jnp.concatenate(out_acc, axis=0)
    return inps, out
