"""Fisher-weighted reconstruction (opt_mode 'fisher_diag' / 'fisher_full').

Functional equivalent of the reference gradient capture
(qdiff/utils.py:152-183 save_grad_data + :271-308 GetLayerGrad): the
reconstruction loss of a block is weighted by the gradient of
KL(FP-output || quantized-output) with respect to that block's output.

The reference registers a backward hook and runs torch autograd; here the
block output is an explicit function input (QuantCtx.substitute) and
jax.grad differentiates the model-output KL with respect to it — the
suffix-only VJP the hook computes, with the prefix dead-code-eliminated.

Captured grads follow the reference post-processing: |g| + 1.0
(utils.py:177).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

Array = jnp.ndarray


def _kl_batchmean(out_q: Array, out_fp: Array) -> Array:
    """F.kl_div(log_softmax(out_q, ch), softmax(out_fp, ch), 'batchmean');
    channel axis is the NCHW dim-1 == our trailing axis."""
    logq = jax.nn.log_softmax(out_q, axis=-1)
    p = jax.nn.softmax(out_fp, axis=-1)
    logp = jax.nn.log_softmax(out_fp, axis=-1)
    return jnp.sum(p * (logp - logq)) / out_q.shape[0]


def save_grad_data(
    model,
    params: dict,
    qstate: dict,
    unit_name: str,
    cali_xs: Array,
    cali_ts: Array,
    cali_cs: Optional[Array] = None,
    *,
    act_quant: bool = False,
    batch_size: int = 8,
) -> Array:
    """Fisher grads of `unit_name`'s output over the calibration set."""
    q_mode = QuantMode(w=True, a=act_quant, soft=False)

    def fwd(p, q, x, t, c, mode, capture):
        ctx = QuantCtx(q, mode=mode, capture=capture)
        if c is None:
            out = model.apply(p, x, t, ctx)
        else:
            out = model.apply(p, x, t, ctx, context=c)
        if capture:
            return ctx.captured[unit_name]["out"]
        return out

    @jax.jit
    def grad_batch(p, q, x, t, c):
        out_fp = fwd(p, q, x, t, c, QuantMode.off(), None)
        blk_out = fwd(p, q, x, t, c, q_mode, unit_name)

        def kl_of(sub):
            ctx = QuantCtx(q, mode=QuantMode.off(),
                           substitute={unit_name: sub}, differentiable=True)
            if c is None:
                out_q = model.apply(p, x, t, ctx)
            else:
                out_q = model.apply(p, x, t, ctx, context=c)
            return _kl_batchmean(out_q, out_fp)

        g = jax.grad(kl_of)(blk_out)
        return jnp.abs(g) + 1.0

    n = cali_xs.shape[0]
    grads = []
    for i in range(0, n - batch_size + 1, batch_size):
        c = cali_cs[i : i + batch_size] if cali_cs is not None else None
        grads.append(grad_batch(params, qstate, cali_xs[i : i + batch_size],
                                cali_ts[i : i + batch_size], c))
    return jnp.concatenate(grads, axis=0)


def fisher_rec_loss(pred: Array, tgt: Array, grad: Array, mode: str,
                    axis: int = -1) -> Array:
    """Reference LossFunction rec branches (block_recon.py:206-212)."""
    if mode == "fisher_diag":
        return jnp.mean(jnp.sum((pred - tgt) ** 2 * grad**2, axis=axis))
    if mode == "fisher_full":
        a = jnp.abs(pred - tgt)
        g = jnp.abs(grad)
        red = tuple(range(1, pred.ndim))
        dot = jnp.sum(a * g, axis=red).reshape(
            (-1,) + (1,) * (pred.ndim - 1))
        return jnp.mean(dot * a * g) / 100.0
    raise ValueError(mode)
