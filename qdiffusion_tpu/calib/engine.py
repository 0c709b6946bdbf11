"""End-to-end PTQ calibration driver.

Orchestrates the reference flow (scripts/sample_diffusion_ddim.py:127-236):

  1. weight-quantizer scale init (per-channel min-max / MSE, directly from
     the weights — the reference does this via a dummy forward);
  2. per-unit AdaRound weight reconstruction in model order, asymmetric
     (inputs captured from the already-quantized prefix);
  3. optional activation pass: first-batch delta init, optional
     running-stat EMA sweep, then per-unit delta learning.

The calibrated result is a single qstate pytree — checkpoint it with orbax;
no Parameter promotion (contrast reference resume_cali_model,
qdiff/utils.py:382-457).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qdiffusion_tpu.calib.capture import GroupedCapture, capture_unit_io
from qdiffusion_tpu.calib.recon import ReconConfig, reconstruct_unit
from qdiffusion_tpu.ops.qlayers import split_weight
from qdiffusion_tpu.quant.affine import init_state
from qdiffusion_tpu.quant.context import EMA, EMA_SM_ONLY, INIT, QuantCtx, QuantMode

logger = logging.getLogger(__name__)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CalibConfig:
    weight: ReconConfig = ReconConfig(iters=20000, p=2.0)
    act: ReconConfig = ReconConfig(iters=5000, lr=4e-4, p=2.4)
    asym: bool = True
    quant_act: bool = False
    running_stat: bool = False
    rs_sm_only: bool = False  # running stats only for post-softmax quantizers
    capture_batch: int = 8
    act_init_batch: int = 64
    sm_abit: int = 8
    # AdaRound alpha STORAGE dtype. 'bfloat16' halves the weight-sized
    # alpha tree's HBM residency (~3.4 GB -> 1.7 GB for the 860M SD UNet
    # — the dominant constant next to params during SD-scale calibration,
    # runs/logs_r4_sd OOMs); optimization still accumulates in f32
    # (recon runners upcast at entry, downcast once at exit), so the only
    # loss is one bf16 rounding of the final alpha — the rectified
    # sigmoid h(alpha) and the alpha>=0 hard threshold are insensitive.
    alpha_dtype: str = "float32"
    skip_units: Tuple[str, ...] = ()  # names excluded from reconstruction
    # Checkpoint snapshot cadence (units). Each phase writes ONE full base
    # snapshot before its unit loop starts (only params + qstate resident
    # — pulling the weight-sized alpha tree next to live capture buffers
    # OOM'd the v5e at SD scale, runs/logs_r4_sd); every in-loop snapshot
    # is an increment of the sites reconstructed since the previous one,
    # so the cadence mainly bounds how many units a crash re-does.
    ckpt_every: int = 8
    # Grouped capture (calib/capture.py::GroupedCapture): shape-shared
    # capture programs over unit groups — ceil(N/G) compiles per mode
    # instead of 2N (the round-2 cold-calibration wall). Groups are packed
    # by estimated on-device capture bytes (full calibration set).
    grouped_capture: bool = True
    capture_group_bytes: int = 3 << 30
    # AOT precompile: trace+lower every distinct recon-runner structure
    # and the group capture sweeps upfront on the host, compiling them on
    # `precompile` background thread(s) before the unit loop starts. The
    # loop then runs compile-free: host tracing (10-20s per distinct
    # structure on this single-core box) overlaps the remote XLA compiles
    # (20-40s each), and with >1 thread the compiles overlap each other:
    # the remote compile server runs concurrent compiles at a measured
    # 2.61x wall speedup with flat per-compile times (the round-5 1-vs-4
    # A/B, docs/E2E_RUN.md precompile thread-count study) — hence the
    # default of 4. The residual cold-calibration wall was ~30 such
    # compiles serialized (round-3 table). 0 = off. Requires
    # grouped_capture and mse opt_mode (fisher capture shapes are
    # data-dependent).
    precompile: int = 4
    pipeline: bool = False  # overlap unit N+1 trace/compile with unit N's
    # device execution (JAX async dispatch). The math is identical — the
    # asym capture of unit N+1 depends on unit N's reconstructed qstate
    # VALUES, an execution-time dependency XLA sequences on device; only
    # the host-side per-unit block_until_ready forfeits the overlap.
    # MEASURED (scripts/calib_bench.py pipeline-{sync,async}, cold
    # processes, 6 units x 4000 iters): on the axon remote-compile tunnel
    # pipelining is 2.5x SLOWER (118s -> 299s) — compile requests and
    # execution streams contend on the terminal — hence default off; on a
    # conventional host-attached TPU the overlap is free wall-clock.
    # Forced off when a checkpointer is used (snapshots pull qstate to
    # host after every unit).


def init_weight_qstate(model, params: dict) -> dict:
    """Scale-init every weight quantizer from the weights themselves,
    split-aware (reference first-forward init, quant_layer.py:68-75 +
    set_split, :285-288)."""
    from qdiffusion_tpu.models.unet_ddim import _sub

    qstate: dict = {}
    for name, cfg in model.layer_cfgs.items():
        w = _sub(params, name)["w"]
        if cfg.split:
            w_a, w_b = split_weight(w, cfg.split, cfg.in_axis)
            qstate[name] = {"w": init_state(w_a, cfg.wq),
                            "w0": init_state(w_b, cfg.wq)}
        else:
            qstate[name] = {"w": init_state(w, cfg.wq)}
    return qstate


def _merge_collected(qstate: dict, collected: dict) -> dict:
    new = {k: dict(v) for k, v in qstate.items()}
    for name, slots in collected.items():
        cur = dict(new.get(name, {}))
        cur.update(slots)
        new[name] = cur
    return new


def init_act_qstate(model, params: dict, qstate: dict, xs: Array, ts: Array,
                    cs: Optional[Array] = None) -> dict:
    """First-batch activation scale init with weights quantized
    (reference qnn.set_quant_state(True, True) + one forward over 64
    samples, sample_diffusion_ddim.py:203-208)."""

    @jax.jit
    def run(p, q, x, t, c):
        ctx = QuantCtx(q, mode=QuantMode(w=True, a=True), collect=INIT)
        if c is None:
            model.apply(p, x, t, ctx)
        else:
            model.apply(p, x, t, ctx, context=c)
        return ctx.collected

    collected = run(params, qstate, xs, ts, cs)
    return _merge_collected(qstate, collected)


def run_running_stat(model, params: dict, qstate: dict, xs: Array, ts: Array,
                     cs: Optional[Array] = None, *, batch: int = 64,
                     sm_only: bool = False) -> dict:
    """EMA sweep over the calibration set (reference set_running_stat,
    quant_model.py:71-87)."""
    collect = EMA_SM_ONLY if sm_only else EMA

    @jax.jit
    def run(p, q, x, t, c):
        ctx = QuantCtx(q, mode=QuantMode(w=True, a=True), collect=collect)
        if c is None:
            model.apply(p, x, t, ctx)
        else:
            model.apply(p, x, t, ctx, context=c)
        return ctx.collected

    n = xs.shape[0]
    for i in range(0, n - batch + 1, batch):
        c = cs[i : i + batch] if cs is not None else None
        collected = run(params, qstate, xs[i : i + batch], ts[i : i + batch], c)
        qstate = _merge_collected(qstate, collected)
    return qstate


def _precompile(model, params, qstate, names, unit_by_name, gc, groups,
                rcfg, cfg: CalibConfig, cali, *, act_quant: bool):
    """AOT-lower every distinct recon-runner structure among `names` plus
    each group's capture sweeps, compiling them on cfg.precompile
    background thread(s). Blocks until every executable is in cache — a
    live call racing an in-flight compile would start a duplicate remote
    compile rather than wait for it. qstate must already have its final
    pytree structure for the pass (post alpha pre-init / act init).

    On the CPU backend the whole pass runs INLINE on the main thread,
    with no executor: XLA:CPU's in-process LLVM compile segfaults when a
    background-thread Lowered.compile() overlaps main-thread tracing or
    compiling (reproduced in full-suite pytest runs even at
    precompile=1, where a lock around compile() alone covers nothing —
    main-thread lower_unit_runner raced the worker's compile). Threads
    only ever paid off by overlapping *remote tunnel* compiles; on CPU
    they can only lose, so single-threaded is both the fix and the
    right behavior."""
    import concurrent.futures as cf

    from qdiffusion_tpu.calib.recon import lower_unit_runner

    xs, ts, cs = cali
    inline = jax.default_backend() == "cpu"
    t0 = time.time()
    remaining = set(names)
    lowered = []
    for group in groups:
        q_names = [n for n in group if n in remaining]
        lowered += gc.lower_sweeps(
            group, params, qstate, xs, ts, cs, fp=True,
            quant_act=False if (not act_quant and cfg.asym) else None,
            q_names=q_names)
    shapes = gc.unit_shapes(names, params, xs, ts, cs)

    def _runner_lowereds():
        for n in names:
            unit = unit_by_name[n][1]
            inps, out = shapes[n]
            low = lower_unit_runner(
                model, params, qstate, unit, rcfg, act_quant=act_quant,
                sm_abit=cfg.sm_abit, inps_shapes=inps, out_shape=out,
                alpha_dtype=cfg.alpha_dtype)
            if low is not None:
                yield low

    if inline:
        runner_lowereds = list(_runner_lowereds())
        t_lower = time.time() - t0  # lowering done; compiles follow
        n_progs = 0
        for low in lowered + runner_lowereds:
            low.compile()
            n_progs += 1
    else:
        with cf.ThreadPoolExecutor(max_workers=cfg.precompile) as ex:
            futs = [ex.submit(low.compile) for low in lowered]
            futs += [ex.submit(low.compile) for low in _runner_lowereds()]
            t_lower = time.time() - t0
            for f in futs:
                f.result()
        n_progs = len(futs)
    logger.info("precompile(%s): %d program(s), lowering done at %.1fs, "
                "all compiled at %.1fs (%s)",
                "act" if act_quant else "weight", n_progs, t_lower,
                time.time() - t0,
                "inline/cpu" if inline else "%d thread(s)" % cfg.precompile)


def calibrate(
    model,
    params: dict,
    cali_data: Tuple[Array, ...],
    cfg: CalibConfig = CalibConfig(),
    rng: Optional[jax.Array] = None,
    qstate: Optional[dict] = None,
    checkpointer=None,
    skip_weight_pass: bool = False,
) -> dict:
    """Full PTQ calibration; returns the calibrated quantizer pytree.

    checkpointer: optional utils.checkpoints.CalibCheckpointer — snapshots
    qstate after every unit and resumes a crashed run (reference
    mid-calibration temp ckpts, txt2img.py:422-428).
    skip_weight_pass: run only the activation pass on an already
    weight-reconstructed qstate (reference --resume_w)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cali_xs, cali_ts = cali_data[0], cali_data[1]
    cali_cs = cali_data[2] if len(cali_data) > 2 else None

    start_phase, start_idx = "weight", 0
    if skip_weight_pass:
        assert qstate is not None, "skip_weight_pass requires a qstate"
        start_phase, start_idx = "act_init", 0
    if checkpointer is not None:
        saved_qstate, progress = checkpointer.load()
        if saved_qstate is not None:
            qstate = saved_qstate
            start_phase = progress["phase"]
            start_idx = progress["unit_idx"] + 1

    if qstate is None:
        # one jitted program: eager per-layer scale init costs one RPC per
        # op on remote-dispatch setups (minutes at 38 layers over the
        # axon tunnel)
        qstate = jax.jit(lambda p: init_weight_qstate(model, p))(params)
        logger.info("weight quantizer scales initialized (%d layers)",
                    len(qstate))

    gc = (GroupedCapture(model, batch_size=cfg.capture_batch,
                         group_bytes=cfg.capture_group_bytes)
          if cfg.grouped_capture else None)
    unit_by_name = {u.name: (k, u) for k, u in enumerate(model.units)}

    def _plan(names):
        if gc is not None and names:
            return gc.plan(names, params, cali_xs, cali_ts, cali_cs)
        return [(n,) for n in names]

    # Sites touched since the last snapshot (reconstruct_unit writes
    # unit.layer_names + the unit's own attention-slot site) — passed to
    # the checkpointer so SD-scale snapshots are incremental instead of
    # pulling the full weight-sized alpha tree every ckpt_every units.
    pending_sites: set = set()

    # ---- weight rounding pass -------------------------------------------
    if start_phase == "weight":
        w_names = []
        for unit in model.units:
            if unit.name in cfg.skip_units or not unit.layer_names:
                logger.info("skip reconstruction of %s", unit.name)
            else:
                w_names.append(unit.name)
        if gc is not None and cfg.asym and w_names:
            # Pre-init every recon unit's AdaRound alphas in ONE jitted
            # program. Without this the qstate pytree STRUCTURE grows
            # after each unit's recon (alpha leaves appear), retracing and
            # recompiling the group asym-capture program for every unit —
            # exactly the per-unit compile wall grouping exists to kill.
            # Values are unchanged: prefix units are always reconstructed
            # (optimized alphas) before unit j's capture, and suffix units
            # past j are XLA-discarded from j's captured input.
            from qdiffusion_tpu.calib.recon import init_adaround_unit

            def _pre_init(p, q):
                for n in w_names:
                    q = init_adaround_unit(model, p, q, unit_by_name[n][1],
                                           skip_existing=True,
                                           alpha_dtype=cfg.alpha_dtype)
                return q

            qstate = jax.jit(_pre_init)(params, qstate)
            logger.info("adaround alphas pre-initialized "
                        "(constant capture-program structure)")
        if checkpointer is not None and not checkpointer.has_base:
            # Write the FULL base snapshot NOW, while only params + qstate
            # are resident: alphas are already pre-initialized (final
            # pytree structure) and no group capture buffers exist yet.
            # Pulling the weight-sized alpha tree (~3.4 GB at SD scale)
            # mid-loop next to live capture buffers OOM'd the 16 GB v5e
            # (round-4 runs, unit 8/80); from here every in-loop save is
            # an increment of a few units' sites.
            t0 = time.time()
            checkpointer.save(qstate, "weight", start_idx - 1, sites=None)
            logger.info("base qstate snapshot written (%.1fs)",
                        time.time() - t0)
        w_groups = _plan(w_names)
        if (cfg.precompile and gc is not None and w_names
                and cfg.weight.opt_mode == "mse"):
            # on resume, only lower/compile what the loop will still run
            rem = [n for n in w_names if unit_by_name[n][0] >= start_idx]
            rem_groups = [g for g in w_groups
                          if any(unit_by_name[n][0] >= start_idx for n in g)]
            if rem:
                _precompile(model, params, qstate, rem, unit_by_name, gc,
                            rem_groups, cfg.weight, cfg,
                            (cali_xs, cali_ts, cali_cs), act_quant=False)
        save_due = False
        for group in w_groups:
            if all(unit_by_name[n][0] < start_idx for n in group):
                continue
            fp = (gc.fp_capture(params, group, cali_xs, cali_ts, cali_cs)
                  if gc is not None else None)
            if fp is not None and cfg.asym:
                # asym recon only reads the FP OUTPUT (the target); the
                # inputs come from the quantized-prefix sweep. Free the
                # FP input buffers now — they are ~half the group's
                # capture bytes held across every recon in the group
                # (part of the SD-scale residency that OOM'd the v5e,
                # runs/logs_r4_sd + logs_r5_sd first attempt).
                fp = {n: (None, out) for n, (inp, out) in fp.items()}
            inps = out = grads = None
            for name in group:
                k, unit = unit_by_name[name]
                if k < start_idx:
                    continue
                t0 = time.time()
                if gc is not None:
                    # free the previous unit's full-set buffers BEFORE the
                    # next capture dispatch: at the 64x64 SD decoder tail
                    # one unit's inputs are ~2 GB, and holding them across
                    # the sweep was part of the unit-68 OOM
                    # (runs/logs_r5_sd/calibrate_r5.log)
                    inps = out = grads = None
                    out = fp[name][1]
                    inps = (gc.quant_capture(
                        params, qstate, name, cali_xs, cali_ts,
                        cali_cs, act_quant=False)
                        if cfg.asym else fp[name][0])
                else:
                    inps, out = capture_unit_io(
                        model, params, qstate, name, cali_xs, cali_ts,
                        cali_cs, asym=cfg.asym, act_quant=False,
                        batch_size=cfg.capture_batch)
                jax.block_until_ready(inps[0])
                t_cap = time.time() - t0
                grads = None
                if cfg.weight.opt_mode != "mse":
                    from qdiffusion_tpu.calib.fisher import save_grad_data

                    grads = save_grad_data(
                        model, params, qstate, name, cali_xs, cali_ts,
                        cali_cs, act_quant=False,
                        batch_size=cfg.capture_batch)
                rng, sub = jax.random.split(rng)
                qstate = reconstruct_unit(
                    model, params, qstate, unit, inps, out, cfg.weight,
                    act_quant=False, rng=sub, sm_abit=cfg.sm_abit,
                    cached_grads=grads, alpha_dtype=cfg.alpha_dtype)
                if fp is not None:
                    fp.pop(name, None)  # free this unit's capture buffers
                pending_sites.update(unit.layer_names)
                pending_sites.add(unit.name)
                if checkpointer is not None or not cfg.pipeline:
                    # block on what the pass actually writes: weight recon
                    # updates ALPHA (delta is untouched and already
                    # materialized, so blocking on it measures nothing)
                    st0 = qstate[unit.layer_names[0]]["w"]
                    jax.block_until_ready(st0.get("alpha", st0["delta"]))
                    logger.info("[%d/%d] weight recon %-28s %.1fs "
                                "(capture %.1fs)", k + 1, len(model.units),
                                name, time.time() - t0, t_cap)
                else:
                    logger.info("[%d/%d] weight recon %-28s dispatched "
                                "(+%.1fs)", k + 1, len(model.units), name,
                                time.time() - t0)
                if checkpointer is not None and \
                        (k + 1) % cfg.ckpt_every == 0:
                    # drop this unit's capture buffers before the pull —
                    # the snapshot's device-side pack allocates next to
                    # whatever is still resident (unit-72 increment OOM,
                    # runs/logs_r5_sd/calibrate_r5_resume.log)
                    inps = out = grads = None
                    if checkpointer.save(qstate, "weight", k,
                                         sites=sorted(pending_sites)):
                        pending_sites.clear()
                    else:
                        save_due = True
            inps = out = grads = None
            del fp
            if checkpointer is not None and save_due:
                # deferred snapshot: retry now that the group's capture
                # buffers are freed (the save itself is best-effort and
                # keeps pending sites on a further failure)
                if checkpointer.save(qstate, "weight", k,
                                     sites=sorted(pending_sites)):
                    pending_sites.clear()
                    save_due = False
    if start_phase == "weight":
        start_idx = 0
        if cfg.pipeline and checkpointer is None:
            t0 = time.time()
            jax.block_until_ready(qstate)
            logger.info("weight pass drained (%.1fs)", time.time() - t0)

    if not cfg.quant_act:
        if checkpointer is not None:
            checkpointer.finalize(qstate)
        return qstate

    # ---- activation pass --------------------------------------------------
    if start_phase in ("weight", "act_init"):
        n_init = min(cfg.act_init_batch, cali_xs.shape[0])
        rng, sub = jax.random.split(rng)
        inds = jax.random.choice(sub, cali_xs.shape[0], (n_init,),
                                 replace=False)
        qstate = init_act_qstate(
            model, params, qstate, jnp.take(cali_xs, inds, axis=0),
            jnp.take(cali_ts, inds, axis=0),
            jnp.take(cali_cs, inds, axis=0) if cali_cs is not None else None)
        logger.info("activation quantizer scales initialized")

        if cfg.running_stat:
            qstate = run_running_stat(model, params, qstate, cali_xs, cali_ts,
                                      cali_cs, batch=cfg.act_init_batch,
                                      sm_only=cfg.rs_sm_only)
            logger.info("running-stat EMA sweep done")
        start_idx = 0
        if checkpointer is not None:
            # act init + the running-stat sweep touch EVERY site, so the
            # act phase needs a fresh full base — written HERE, before the
            # unit loop allocates capture buffers (same OOM avoidance as
            # the weight-pass base above).
            t0 = time.time()
            checkpointer.save(qstate, "act", -1, sites=None)
            pending_sites.clear()
            logger.info("act-phase base qstate snapshot written (%.1fs)",
                        time.time() - t0)

    a_names = [u.name for u in model.units if u.name not in cfg.skip_units]
    a_groups = _plan(a_names)
    if (cfg.precompile and gc is not None and a_names
            and cfg.act.opt_mode == "mse"):
        _precompile(model, params, qstate, a_names, unit_by_name, gc,
                    a_groups, cfg.act, cfg, (cali_xs, cali_ts, cali_cs),
                    act_quant=True)
    save_due = False
    for group in a_groups:
        if all(unit_by_name[n][0] < start_idx for n in group):
            continue
        fp = (gc.fp_capture(params, group, cali_xs, cali_ts, cali_cs)
              if gc is not None else None)
        for name in group:
            k, unit = unit_by_name[name]
            if k < start_idx:
                continue
            t0 = time.time()
            if gc is not None:
                inps, out = fp[name]
            else:
                inps, out = capture_unit_io(
                    model, params, qstate, name, cali_xs, cali_ts, cali_cs,
                    asym=False, act_quant=True,
                    batch_size=cfg.capture_batch)
            grads = None
            if cfg.act.opt_mode != "mse":
                from qdiffusion_tpu.calib.fisher import save_grad_data

                grads = save_grad_data(
                    model, params, qstate, name, cali_xs, cali_ts, cali_cs,
                    act_quant=True, batch_size=cfg.capture_batch)
            rng, sub = jax.random.split(rng)
            qstate = reconstruct_unit(model, params, qstate, unit, inps,
                                      out, cfg.act, act_quant=True, rng=sub,
                                      sm_abit=cfg.sm_abit,
                                      cached_grads=grads)
            if fp is not None:
                # drop the dict's reference — the local inps/out (and the
                # in-flight recon's own buffer refs) keep the arrays alive
                # exactly until the next unit rebinds them
                fp.pop(name, None)
            logger.info("[%d/%d] act recon    %-28s %.1fs", k + 1,
                        len(model.units), name, time.time() - t0)
            pending_sites.update(unit.layer_names)
            pending_sites.add(unit.name)
            if checkpointer is not None and (k + 1) % cfg.ckpt_every == 0:
                inps = out = grads = None
                if checkpointer.save(qstate, "act", k,
                                     sites=sorted(pending_sites)):
                    pending_sites.clear()
                else:
                    save_due = True
        inps = out = grads = None
        del fp
        if checkpointer is not None and save_due:
            if checkpointer.save(qstate, "act", k,
                                 sites=sorted(pending_sites)):
                pending_sites.clear()
                save_due = False

    if checkpointer is not None:
        checkpointer.finalize(qstate)
    return qstate
