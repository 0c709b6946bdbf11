"""Block / layer reconstruction: the AdaRound calibration optimizer.

Functional equivalent of reference qdiff/block_recon.py + layer_recon.py:
per reconstruction unit, Adam minimizes

    L = lp_loss(block_q(inp), out_fp, p)  +  w * sum(1 - |2 h(alpha) - 1|^b)

over AdaRound alphas (weight pass, 20k iters, temperature b linearly
decayed 20 -> 2 after 20% warmup) or over activation-quantizer deltas (act
pass, 5k iters, cosine-annealed LR, no rounding term). The reference runs
20k Python steps per block; here the whole loop is one jitted
`lax.fori_loop` with the cached (inp, out) tensors resident in HBM, and
minibatches gathered on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from qdiffusion_tpu.ops.qlayers import split_weight
from qdiffusion_tpu.quant.adaround import adaround_init_alpha, adaround_soft_targets
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

Array = jnp.ndarray

ACT_SLOTS = ("a", "a0", "q", "k", "v", "sm")


@dataclasses.dataclass(frozen=True)
class ReconConfig:
    iters: int = 20000
    batch_size: int = 32
    weight: float = 0.01  # rounding-regularizer weight
    b_start: float = 20.0
    b_end: float = 2.0
    warmup: float = 0.2
    p: float = 2.0  # Lp reconstruction norm (weight pass; act pass uses 2.4)
    lr: float = 4e-4  # act-delta learning rate
    alpha_lr: float = 1e-3  # Adam default, used for AdaRound alphas
    opt_mode: str = "mse"  # 'mse' | 'fisher_diag' | 'fisher_full'


# ---------------------------------------------------------------------------
# AdaRound state initialization
# ---------------------------------------------------------------------------


def init_adaround_unit(model, params: dict, qstate: dict, unit, *,
                       skip_existing: bool = False,
                       alpha_dtype=None) -> dict:
    """Add AdaRound alpha leaves to every weight quantizer in `unit`
    (reference block_recon.py:47-61: swap UniformAffineQuantizer ->
    AdaRoundQuantizer, split-aware).

    skip_existing=True preserves alphas already present — used by the
    engine's upfront all-unit pre-init (keeps the asym-capture program's
    qstate STRUCTURE constant across the weight pass, so the grouped
    capture program never retraces) without clobbering optimized alphas
    on checkpoint resume.

    alpha_dtype: storage dtype for new alpha leaves (CalibConfig.
    alpha_dtype; bfloat16 halves the weight-sized alpha tree at SD
    scale — see adaround_init_alpha)."""
    from qdiffusion_tpu.models.unet_ddim import _sub  # tree access helper

    new = dict(qstate)
    for lname in unit.layer_names:
        cfg = model.layer_cfg(lname)
        w = _sub(params, lname)["w"]
        lstate = dict(new.get(lname, {}))
        if cfg.split:
            w_a, w_b = split_weight(w, cfg.split, cfg.in_axis)
            for slot, ww in (("w", w_a), ("w0", w_b)):
                if skip_existing and "alpha" in lstate[slot]:
                    continue
                st = dict(lstate[slot])
                st["alpha"] = adaround_init_alpha(ww, st["delta"],
                                                  dtype=alpha_dtype)
                lstate[slot] = st
        else:
            if skip_existing and "alpha" in lstate["w"]:
                new[lname] = lstate
                continue
            st = dict(lstate["w"])
            st["alpha"] = adaround_init_alpha(w, st["delta"],
                                              dtype=alpha_dtype)
            lstate["w"] = st
        new[lname] = lstate
    return new


# ---------------------------------------------------------------------------
# trainable-subtree extraction / merge
# ---------------------------------------------------------------------------


def extract_trainable(qstate: dict, unit, mode: str,
                      sm_abit: int = 8) -> Dict[str, Dict[str, Array]]:
    """mode='weight': alpha leaves of the unit's weight quantizers.
    mode='act': delta leaves of its act quantizers (16-bit post-softmax
    excluded, reference block_recon.py:87-98)."""
    train: Dict[str, Dict[str, Array]] = {}
    sites = (list(unit.layer_names) + [unit.name]
             + list(getattr(unit, "extra_sites", [])))
    for site in sites:
        slots = qstate.get(site)
        if not slots:
            continue
        for slot, st in slots.items():
            if mode == "weight" and slot in ("w", "w0") and "alpha" in st:
                train.setdefault(site, {})[slot] = st["alpha"]
            elif mode == "act" and slot in ACT_SLOTS:
                if slot == "sm" and sm_abit == 16:
                    continue
                train.setdefault(site, {})[slot] = st["delta"]
    return train


def _insert_path(tree: dict, dotted: str, node) -> None:
    parts = dotted.split(".")
    cur = tree
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = node


def unit_param_paths(params: dict, unit) -> list:
    """Minimal list of resolvable root paths covering everything
    `unit.apply` reads (the unit's own block subtree plus any layer paths
    outside it); deterministic order — the canonical relabeling in
    reconstruct_unit indexes into it."""
    from qdiffusion_tpu.models.base import _sub

    paths: list = []
    for pth in [unit.name] + list(unit.layer_names):
        if any(pth == q or pth.startswith(q + ".") for q in paths):
            continue
        paths = [q for q in paths if not q.startswith(pth + ".")]
        paths.append(pth)
    out = []
    for pth in paths:
        try:
            _sub(params, pth)
        except (KeyError, TypeError):
            continue  # non-param site (e.g. attention matmul unit names)
        out.append(pth)
    return out


def _sub_path(params: dict, pth: str):
    from qdiffusion_tpu.models.base import _sub

    return _sub(params, pth)


def unit_param_subtree(params: dict, unit) -> dict:
    """The minimal params subtree `unit.apply` reads, re-rooted with the
    original nesting so the unit's absolute-path lookups still resolve.

    Passing this as a jit ARGUMENT instead of closing over the full tree
    keeps weights out of the compiled program (multi-MB constants) and
    makes the reconstruction HLO shape-only; reconstruct_unit goes one
    step further and relabels it canonically so same-structure units
    share one TRACE, not just one XLA compile."""
    sub: dict = {}
    for pth in unit_param_paths(params, unit):
        _insert_path(sub, pth, _sub_path(params, pth))
    return sub


# jitted reconstruction runners shared across same-structure units
# (see reconstruct_unit); key -> (jitted run, swap cell)
_RUN_CACHE: dict = {}


def unit_qstate_subtree(qstate: dict, unit) -> dict:
    """The unit's quantizer states (flat site-keyed dict, same layout as
    the full qstate so QuantCtx lookups resolve unchanged)."""
    sites = (list(unit.layer_names) + [unit.name]
             + list(getattr(unit, "extra_sites", [])))
    return {s: qstate[s] for s in dict.fromkeys(sites) if s in qstate}


def merge_trainable(qstate: dict, train: dict, mode: str) -> dict:
    key = "alpha" if mode == "weight" else "delta"
    new = {k: dict(v) for k, v in qstate.items()}
    for site, slots in train.items():
        for slot, val in slots.items():
            st = dict(new[site][slot])
            st[key] = val
            new[site][slot] = st
    return new


# ---------------------------------------------------------------------------
# temperature decay (reference LinearTempDecay, block_recon.py:235-252)
# ---------------------------------------------------------------------------


def temp_decay(t: Array, t_max: float, warmup: float, start_b: float,
               end_b: float) -> Array:
    start_decay = warmup * t_max
    rel_t = (t - start_decay) / (t_max - start_decay)
    decayed = end_b + (start_b - end_b) * jnp.maximum(0.0, 1.0 - rel_t)
    return jnp.where(t < start_decay, start_b, decayed)


# ---------------------------------------------------------------------------
# reconstruction loop
# ---------------------------------------------------------------------------


def reconstruct_unit(
    model,
    params: dict,
    qstate: dict,
    unit,
    cached_inps: Tuple[Array, ...],
    cached_out: Array,
    cfg: ReconConfig,
    *,
    act_quant: bool = False,
    rng: Optional[jax.Array] = None,
    sm_abit: int = 8,
    cached_grads: Optional[Array] = None,
    alpha_dtype=None,
) -> dict:
    """Optimize the unit's rounding (act_quant=False) or act deltas
    (act_quant=True); returns the updated full qstate.

    cached_grads: Fisher weights aligned with cached_out (required when
    cfg.opt_mode != 'mse'; see calib/fisher.py).
    alpha_dtype: AdaRound alpha storage dtype (CalibConfig.alpha_dtype) —
    must match the engine's pre-init so the runner cache key (leaf
    dtypes) hits the precompiled program."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    mode = "act" if act_quant else "weight"
    if cfg.opt_mode != "mse":
        assert cached_grads is not None, "fisher modes need cached grads"

    if not act_quant:
        qstate = init_adaround_unit(model, params, qstate, unit,
                                    alpha_dtype=alpha_dtype)

    key, arg_tree, p_paths, q_sites = _canonical_args(
        params, qstate, unit, mode, cfg, sm_abit, cached_inps, cached_out,
        cached_grads)
    if not arg_tree[0]:  # no trainable leaves in this unit
        return qstate
    run, cell = _get_runner(key, cfg, mode, sm_abit,
                            getattr(unit, "loss_axis", -1),
                            len(cached_inps) > 1)
    cell["apply"] = unit.apply
    cell["p_paths"] = p_paths
    cell["q_sites"] = q_sites
    c_train_final = run(*arg_tree, rng)
    train_final = {q_sites[int(k[1:])]: v for k, v in c_train_final.items()}
    return merge_trainable(qstate, train_final, mode)


def _canonical_args(params, qstate, unit, mode, cfg, sm_abit, cached_inps,
                    cached_out, cached_grads):
    """Canonical (name-free) runner arguments + the runner cache key.

    The unit's param/qstate subtrees are relabeled to canonical keys
    (p000..., q000...) so every unit with the same kind, local structure,
    and shapes shares ONE jitted runner — zero retrace after the first.
    Leaves may be concrete arrays or ShapeDtypeStructs (the AOT precompile
    path, lower_unit_runner): the key and treedef come out identical
    either way, so a runner lowered ahead of time is the same cache entry
    the live call hits."""
    loss_axis = getattr(unit, "loss_axis", -1)
    p_paths = unit_param_paths(params, unit)
    all_sites = list(dict.fromkeys(
        list(unit.layer_names) + [unit.name]
        + list(getattr(unit, "extra_sites", []))))
    q_sites = [s for s in all_sites if s in qstate]
    train0 = extract_trainable(qstate, unit, mode, sm_abit=sm_abit)

    c_params = {f"p{i:03d}": _sub_path(params, pth)
                for i, pth in enumerate(p_paths)}
    c_qstate = {f"q{i:03d}": qstate[s] for i, s in enumerate(q_sites)}
    site_idx = {s: i for i, s in enumerate(q_sites)}
    c_train0 = {f"q{site_idx[s]:03d}": v for s, v in train0.items()}

    def local_sig(names):
        base = unit.name + "."
        return tuple("~self" if nm == unit.name
                     else nm[len(base):] if nm.startswith(base)
                     else "~abs:" + nm for nm in names)

    arg_tree = (c_train0, c_params, c_qstate, tuple(cached_inps), cached_out,
                cached_grads)
    leaves, treedef = jax.tree_util.tree_flatten(arg_tree)
    shapes = tuple((tuple(a.shape), jnp.result_type(a).name) for a in leaves)
    key = (unit.kind, local_sig(p_paths), local_sig(q_sites), mode, cfg,
           loss_axis, sm_abit, treedef, shapes)
    return key, arg_tree, p_paths, q_sites


def _get_runner(key, cfg: ReconConfig, mode: str, sm_abit: int,
                loss_axis, two_inputs: bool):
    """Build (or fetch) the shared jitted reconstruction runner for `key`.

    On a single-core host the per-unit trace+lower of a 20k-iteration grad
    loop costs 10-20 s, which dominated cold calibration once the capture
    compile wall fell (docs/E2E_RUN.md round-3 table). The runner resolves
    the CURRENT unit's apply/paths through a swap cell: the compiled
    program is a pure function of the flattened arrays (site names never
    reach HLO), and canonical relabeling aligns the flatten order across
    same-structure units; on any treedef/shape mismatch jit retraces with
    the current cell, which is also correct."""
    cached = _RUN_CACHE.get(key)
    if cached is None:
        act_quant = mode == "act"
        p_norm = cfg.p
        fwd_mode = QuantMode(w=True, a=act_quant, soft=not act_quant)
        if act_quant:
            sched = optax.cosine_decay_schedule(cfg.lr, cfg.iters, alpha=0.0)
            opt = optax.adam(sched)
        else:
            opt = optax.adam(cfg.alpha_lr)
        cell = {}

        def loss_fn(c_train, c_sub_p, c_sub_q, b_x, b_t_aux, b_out, b_grad,
                    b_temp, count):
            sub_p: dict = {}
            for i, pth in enumerate(cell["p_paths"]):
                _insert_path(sub_p, pth, c_sub_p[f"p{i:03d}"])
            sub_q = {s: c_sub_q[f"q{i:03d}"]
                     for i, s in enumerate(cell["q_sites"])}
            train = {cell["q_sites"][int(k[1:])]: v
                     for k, v in c_train.items()}
            q = merge_trainable(sub_q, train, mode)
            ctx = QuantCtx(q, mode=fwd_mode, differentiable=True)
            inps = (b_x,) if b_t_aux is None else (b_x, b_t_aux)
            pred = cell["apply"](sub_p, ctx, *inps)
            if cfg.opt_mode != "mse":
                from qdiffusion_tpu.calib.fisher import fisher_rec_loss

                rec = fisher_rec_loss(pred, b_out, b_grad, cfg.opt_mode,
                                      axis=loss_axis)
            else:
                err = jnp.abs(pred - b_out) ** p_norm
                rec = jnp.mean(jnp.sum(err, axis=loss_axis))
            if act_quant:
                return rec
            round_loss = 0.0
            for site, slots in train.items():
                for slot, alpha in slots.items():
                    h = adaround_soft_targets(alpha)
                    round_loss = round_loss + cfg.weight * jnp.sum(
                        1.0 - jnp.abs(2.0 * h - 1.0) ** b_temp)
            # no rounding penalty during warmup (block_recon.py:217-218)
            round_loss = jnp.where(count < cfg.warmup * cfg.iters, 0.0,
                                   round_loss)
            return rec + round_loss

        grad_fn = jax.grad(loss_fn)

        @jax.jit
        def run(train0_, sub_p, sub_q, inps, out, fgrads, key_):
            # Optimize in f32 regardless of the STORAGE dtype: bf16 alpha
            # storage (engine alpha_dtype) must not degrade Adam's
            # accumulation — one downcast happens at exit, after which
            # only the rectified-sigmoid argument (and the alpha >= 0
            # hard-rounding threshold) see the rounded value.
            store_dtypes = jax.tree_util.tree_map(
                lambda a: a.dtype, train0_)
            train0_ = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), train0_)
            n_ = inps[0].shape[0]

            def body(i, carry):
                train, opt_state, k = carry
                key_i = jax.random.fold_in(k, i)
                idx = jax.random.randint(key_i, (cfg.batch_size,), 0, n_)
                b_x = jnp.take(inps[0], idx, axis=0)
                b_aux = jnp.take(inps[1], idx, axis=0) if two_inputs else None
                b_out = jnp.take(out, idx, axis=0)
                b_grad = (jnp.take(fgrads, idx, axis=0)
                          if fgrads is not None else None)
                b_temp = temp_decay(i + 1.0, cfg.iters, cfg.warmup,
                                    cfg.b_start, cfg.b_end)
                grads = grad_fn(train, sub_p, sub_q, b_x, b_aux, b_out,
                                b_grad, b_temp, i + 1.0)
                updates, opt_state = opt.update(grads, opt_state, train)
                train = optax.apply_updates(train, updates)
                return (train, opt_state, k)

            opt_state = opt.init(train0_)
            train, _, _ = jax.lax.fori_loop(
                0, cfg.iters, body, (train0_, opt_state, key_))
            return jax.tree_util.tree_map(
                lambda a, d: a.astype(d), train, store_dtypes)

        cached = (run, cell)
        _RUN_CACHE[key] = cached
    return cached


def lower_unit_runner(model, params: dict, qstate: dict, unit, cfg: ReconConfig,
                      *, act_quant: bool, sm_abit: int = 8,
                      inps_shapes, out_shape, alpha_dtype=None):
    """AOT entry for the calibration precompiler (engine.CalibConfig.
    precompile): build (or fetch) the runner this unit's reconstruction
    will use and return the jax `Lowered` for its exact call signature.
    Compiling it — on any thread — populates the same executable cache
    reconstruct_unit's live call hits, so the unit loop pays zero compile
    wait. Returns None when an identically-keyed runner was already
    lowered (same-structure units share one program) or the unit has no
    trainable leaves. mse opt_mode only (no cached-grads signature).

    params/qstate are the live (concrete) trees; weight-mode AdaRound
    alpha leaves are added abstractly via eval_shape — no compute, no
    value clobbering. inps_shapes/out_shape: full-calibration-set capture
    specs (GroupedCapture.unit_shapes)."""
    mode = "act" if act_quant else "weight"
    if not act_quant:
        qstate = jax.eval_shape(
            lambda p, q: init_adaround_unit(model, p, q, unit,
                                            alpha_dtype=alpha_dtype),
            params, qstate)
    key, arg_tree, p_paths, q_sites = _canonical_args(
        params, qstate, unit, mode, cfg, sm_abit, tuple(inps_shapes),
        out_shape, None)
    if not arg_tree[0] or key in _RUN_CACHE:
        return None
    run, cell = _get_runner(key, cfg, mode, sm_abit,
                            getattr(unit, "loss_axis", -1),
                            len(inps_shapes) > 1)
    cell["apply"] = unit.apply
    cell["p_paths"] = p_paths
    cell["q_sites"] = q_sites
    abs_args = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(tuple(a.shape), jnp.result_type(a)),
        arg_tree)
    rng_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return run.lower(*abs_args, rng_spec)
