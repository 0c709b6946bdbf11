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

import logging
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

Array = jnp.ndarray

logger = logging.getLogger(__name__)


def _batch_starts(n: int, batch_size: int) -> range:
    if n % batch_size:
        # matches the reference's integer-batch loop (qdiff/utils.py:
        # get_train_samples consumers iterate whole batches), but never
        # silently: the tail samples do not enter the calibration cache.
        logger.warning(
            "capture: dropping tail batch of %d sample(s) "
            "(n=%d not divisible by batch_size=%d)",
            n % batch_size, n, batch_size)
    return range(0, n - batch_size + 1, batch_size)


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
    inps_acc, out_acc = None, []
    for i in _batch_starts(n, batch_size):
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


class GroupedCapture:
    """Shape-shared capture programs over groups of consecutive units.

    The per-unit capture above compiles a structurally distinct truncated
    forward for EVERY unit (twice with asym) — at 38 CIFAR units that is
    ~76 remote compiles and the dominant cold-calibration cost (~25 min on
    the axon tunnel; docs/E2E_RUN.md). Grouping G consecutive units into
    one program cuts compiles to ceil(N/G) per mode and FP sweeps to one
    per group, while preserving the reference capture semantics exactly
    (qdiff/utils.py:18-149):

      * FP (inp, out) for a whole group comes from ONE sweep of the
        calibration set (mode off never reads qstate, so one trace serves
        both the weight and activation passes).
      * asym inputs (utils.py:235-243 — prefix weight-quantized with
        already-reconstructed units hard-rounded) still require per-unit
        sweeps, because unit j's input depends on the recon of units < j.
        Each unit gets its OWN program capturing only itself (qstate is a
        jit argument, so re-running after each recon yields unit j's
        input with the correct prefix — zero recompiles per run): the
        forward truncates at unit j and no sibling's full-set buffer is
        materialized, which is what keeps the 64x64 SD decoder groups
        inside 16 GB HBM (see _get_q).

    Group size is planned by bytes: a group's full-set FP captures live on
    device while its units reconstruct, so consecutive units are packed
    until the estimated footprint (jax.eval_shape, no compute) exceeds
    `group_bytes`.
    """

    def __init__(self, model, batch_size: int = 8,
                 group_bytes: int = 3 << 30):
        self.model = model
        self.batch_size = batch_size
        self.group_bytes = group_bytes
        self._fp_jit = {}
        self._q_jit = {}

    # ------------------------------------------------------------- internals

    def _fwd(self, p, q, x, t, c, *, names, mode, want_out):
        ctx = QuantCtx(q, mode=mode, capture=frozenset(names))
        if c is None:
            self.model.apply(p, x, t, ctx)
        else:
            self.model.apply(p, x, t, ctx, context=c)
        res = {}
        for n in names:
            cap = ctx.captured[n]
            inp = cap["inp"] if isinstance(cap["inp"], tuple) else (cap["inp"],)
            res[n] = (inp, cap["out"]) if want_out else inp
        return res

    def _make_sweep(self, names: Tuple[str, ...], mode, want_out: bool):
        """Whole-sweep program: the host batch loop becomes an on-device
        lax.scan, so a full calibration-set capture is ONE dispatch (the
        per-batch host loop cost 30+ round-trips per sweep through the
        remote tunnel — measured dominating the grouped capture)."""

        def sweep(p, q, x, t, c):
            def body(_, batch):
                xb, tb = batch[0], batch[1]
                cb = batch[2] if len(batch) > 2 else None
                return None, self._fwd(p, q, xb, tb, cb, names=names,
                                       mode=mode, want_out=want_out)

            seq = (x, t) if c is None else (x, t, c)
            _, stacked = jax.lax.scan(body, None, seq)
            # (nb, b, ...) -> (nb*b, ...): metadata-only inside the program
            return jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), stacked)

        return jax.jit(sweep)

    def _get_fp(self, names: Tuple[str, ...]):
        if names not in self._fp_jit:
            self._fp_jit[names] = self._make_sweep(
                names, QuantMode.off(), True)
        return self._fp_jit[names]

    def _get_q(self, name: str, act_quant: bool):
        """Per-UNIT quantized-prefix sweep (contrast the grouped FP sweep):
        capturing only `name` lets XLA truncate the forward at the unit
        AND drop every other unit's capture buffer from the program
        outputs. The grouped variant materialized the whole group's
        full-calibration-set input buffers on every call — at SD scale
        the 64x64 decoder groups are ~2 GB/unit, and that transient next
        to params + alphas + the group's FP outputs OOM'd the 16 GB v5e
        at unit 68/80 (runs/logs_r5_sd/calibrate_r5.log). The cost is one
        compile per unit instead of per group; the compile cache and the
        truncated (therefore smaller) programs largely pay it back."""
        key = (name, act_quant)
        if key not in self._q_jit:
            self._q_jit[key] = self._make_sweep(
                (name,), QuantMode(w=True, a=act_quant, soft=False), False)
        return self._q_jit[key]

    def _batched(self, xs, ts, cs):
        """(n, ...) -> (nb, b, ...) whole-batch stacks (tail dropped with
        a warning, reference integer-batch semantics)."""
        b = self.batch_size
        nb = len(_batch_starts(xs.shape[0], b))
        cut = nb * b

        def shape(a):
            return a[:cut].reshape(nb, b, *a.shape[1:])

        return (shape(xs), shape(ts),
                shape(cs) if cs is not None else None)

    # ------------------------------------------------------------------- API

    def unit_shapes(self, unit_names: Sequence[str], params, xs, ts,
                    cs=None) -> dict:
        """Full-calibration-set capture specs per unit:
        {name: (inps_specs, out_spec)} with the leading dim fp_capture /
        quant_capture actually return (nb*b; tail dropped). eval_shape
        only — no compute. Feeds the group planner and the AOT runner
        precompiler (calib/recon.py::lower_unit_runner; asym inputs have
        the same shapes as FP inputs, only the values differ)."""
        b = self.batch_size
        nb = len(_batch_starts(xs.shape[0], b))
        shapes = jax.eval_shape(
            partial(self._fwd, names=tuple(unit_names),
                    mode=QuantMode.off(), want_out=True),
            params, {}, xs[:b], ts[:b],
            cs[:b] if cs is not None else None)

        def full(a):
            return jax.ShapeDtypeStruct((nb * b,) + tuple(a.shape[1:]),
                                        a.dtype)

        return {n: (tuple(full(a) for a in inp), full(out))
                for n, (inp, out) in shapes.items()}

    def plan(self, unit_names: Sequence[str], params, xs, ts,
             cs=None) -> List[Tuple[str, ...]]:
        """Greedy consecutive grouping by estimated full-set capture bytes
        (one jax.eval_shape over an all-units capture — no compute)."""
        shapes = self.unit_shapes(unit_names, params, xs, ts, cs)
        groups: List[Tuple[str, ...]] = []
        cur: List[str] = []
        cur_bytes = 0
        for n in unit_names:
            inp, out = shapes[n]
            nb = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                     for a in (*inp, out))
            if cur and cur_bytes + nb > self.group_bytes:
                groups.append(tuple(cur))
                cur, cur_bytes = [], 0
            cur.append(n)
            cur_bytes += nb
        if cur:
            groups.append(tuple(cur))
        logger.info("capture plan: %d unit(s) in %d group(s)",
                    len(unit_names), len(groups))
        return groups

    def lower_sweeps(self, group: Tuple[str, ...], params, qstate, xs, ts,
                     cs=None, *, fp: bool = True,
                     quant_act: Optional[bool] = None,
                     q_names: Optional[Sequence[str]] = None) -> list:
        """AOT-lower this group's sweep programs (FP capture and, when
        quant_act is not None, the per-unit asym quantized-prefix
        captures with act_quant=quant_act — one program per unit in
        `q_names`, default the whole group) for background compilation;
        returns jax `Lowered` objects. Compiling them populates the same
        jit caches fp_capture/quant_capture hit. qstate must already have
        its final pytree structure for the quantized mode (post alpha
        pre-init / act init)."""
        x, t, c = self._batched(xs, ts, cs)

        def spec(tree):
            return jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(tuple(a.shape), a.dtype),
                tree)

        p_s, x_s, t_s = spec(params), spec(x), spec(t)
        c_s = spec(c) if c is not None else None
        out = []
        if fp:
            out.append(self._get_fp(group).lower(p_s, {}, x_s, t_s, c_s))
        if quant_act is not None:
            q_s = spec(qstate)
            for name in (group if q_names is None else q_names):
                out.append(self._get_q(name, quant_act).lower(
                    p_s, q_s, x_s, t_s, c_s))
        return out

    def fp_capture(self, params, group: Tuple[str, ...], xs, ts, cs=None):
        """ONE dispatch capturing FP (inps, out) for every unit in `group`
        over the whole calibration set: {name: (inps_tuple, out)}."""
        x, t, c = self._batched(xs, ts, cs)
        return self._get_fp(group)(params, {}, x, t, c)

    def quant_capture(self, params, qstate, name: str, xs, ts, cs=None, *,
                      act_quant: bool = False):
        """ONE dispatch with the quantized prefix (current qstate),
        returning `name`'s inputs. qstate is a jit argument, so re-running
        after each unit's recon yields the next unit's asym input with
        zero recompiles; the program captures ONLY `name`, so no other
        unit's buffer is ever materialized (see _get_q)."""
        x, t, c = self._batched(xs, ts, cs)
        return self._get_q(name, act_quant)(params, qstate, x, t, c)[name]
