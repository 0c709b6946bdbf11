"""Command-line entry point.

One CLI with subcommands replaces the reference's three scripts
(scripts/sample_diffusion_ddim.py, sample_diffusion_ldm.py, txt2img.py):

  python -m qdiffusion_tpu.cli make-cali-data --task cifar10 --ckpt fp.ckpt ...
  python -m qdiffusion_tpu.cli calibrate --task cifar10 --ckpt fp.ckpt \
      --cali-data traj.npz --weight-bit 4 --quant-act --act-bit 8 --split
  python -m qdiffusion_tpu.cli sample --task cifar10 --ckpt fp.ckpt \
      --qstate logs/.../qstate.npz --n 50000 --engine int8 --out samples/
  python -m qdiffusion_tpu.cli bench

FP checkpoints are the reference's torch files (auto-converted) or
previously saved npz pytrees. Calibrated quantizer state is one npz pytree.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
from pathlib import Path

import numpy as np

logger = logging.getLogger("qdiffusion_tpu.cli")


def resolve_task(args):
    """--task NAME (preset) or --config PATH (reference YAML, optionally
    renamed by --task). Replaces the reference's per-script OmegaConf load
    (sample_diffusion_ldm.py:Sample `--config`, txt2img.py:load_model_from_config)."""
    from qdiffusion_tpu.config import PRESETS

    config = getattr(args, "config", None)
    if config:
        from qdiffusion_tpu.config_yaml import load_task_config

        return load_task_config(config, name=getattr(args, "task", None))
    if not getattr(args, "task", None):
        raise SystemExit("one of --task or --config is required")
    try:
        return PRESETS[args.task]
    except KeyError:
        raise SystemExit(
            f"unknown task {args.task!r} (presets: {sorted(PRESETS)}; "
            f"or pass a reference YAML via --config)")


def build_model_and_pipeline(task, qflags=None, act_quant=False):
    import jax.numpy as jnp

    from qdiffusion_tpu.config import PRESETS
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet
    from qdiffusion_tpu.models.unet_ldm import LDMUNet
    from qdiffusion_tpu.models.vae import VAE
    from qdiffusion_tpu.models.clip_text import CLIPTextEncoder
    from qdiffusion_tpu.pipelines import (
        LatentDiffusionPipeline,
        PixelDiffusionPipeline,
    )
    from qdiffusion_tpu.schedules import NoiseSchedule

    if task.schedule.kind == "ddpm":
        sched = NoiseSchedule.ddpm(task.schedule.beta_schedule,
                                   task.schedule.beta_start,
                                   task.schedule.beta_end,
                                   task.schedule.num_timesteps)
    else:
        sched = NoiseSchedule.ldm(task.schedule.beta_schedule,
                                  task.schedule.num_timesteps,
                                  task.schedule.beta_start,
                                  task.schedule.beta_end)

    if task.family == "pixel":
        cfg = task.unet_ddim
        if qflags is not None and qflags.split:
            cfg = dataclasses.replace(cfg, split_shortcut=True)
        policy = qflags.policy_ddim() if qflags else None
        model = DDIMUNet(cfg, policy)
        return model, PixelDiffusionPipeline(model, sched)

    cfg = task.unet_ldm
    if qflags is not None and qflags.split:
        cfg = dataclasses.replace(cfg, split_shortcut=True)
    policy = qflags.policy_ldm() if qflags else None
    model = LDMUNet(cfg, policy, act_quant_partition=act_quant)
    vae = VAE(task.vae)
    if task.family == "sd":
        from qdiffusion_tpu.models.clip_text import CLIPTextConfig

        text = CLIPTextEncoder(task.clip or CLIPTextConfig())
    else:
        text = None
    pipe = LatentDiffusionPipeline(
        unet=model, vae=vae, schedule=sched,
        scale_factor=task.scale_factor,
        conditioning_key=task.conditioning_key, text_encoder=text)
    return model, pipe


def load_fp_params(path: str, task, model):
    """Load FP UNet params from torch ckpt or saved npz pytree."""
    from qdiffusion_tpu.models.torch_import import state_dict_to_pytree
    from qdiffusion_tpu.utils.checkpoints import load_torch_checkpoint

    path = Path(path)
    if path.suffix in (".pt", ".pth", ".ckpt"):
        subtree = ("model.diffusion_model."
                   if task.family in ("ldm", "sd") else None)
        sd = load_torch_checkpoint(path, subtree=subtree)
        return state_dict_to_pytree(sd)
    if path.suffix == ".npz":
        from qdiffusion_tpu.utils.checkpoints import load_pytree
        import jax

        # structure-only template: eval_shape costs nothing (eager init
        # over the remote tunnel is one RPC per op)
        like = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
        return load_pytree(path, like)
    raise ValueError(f"unknown checkpoint format: {path}")


def load_clip_params(args, task):
    """CLIP text-tower params for SD conditioning.

    Default source is the main SD checkpoint (the reference keeps the text
    tower inside it under cond_stage_model.transformer.,
    ldm/modules/encoders/modules.py:139); --clip-ckpt overrides."""
    from qdiffusion_tpu.models.clip_text import convert_hf_clip_text
    from qdiffusion_tpu.utils.checkpoints import load_torch_checkpoint

    path = getattr(args, "clip_ckpt", None) or args.ckpt
    if not path:
        raise SystemExit("--prompt needs CLIP weights: pass --ckpt (SD "
                         "checkpoint) or --clip-ckpt")
    if Path(path).suffix == ".npz":  # native converted tree, torch-free
        from qdiffusion_tpu.utils.checkpoints import load_nested

        return load_nested(path)
    sd = load_torch_checkpoint(path, subtree="cond_stage_model.transformer.")
    if not sd:  # a standalone HF CLIPTextModel state_dict
        sd = load_torch_checkpoint(path)
    return convert_hf_clip_text(sd)


def build_conditioning(args, task, pipe):
    """Prompt strings (or precomputed token ids) -> (cond, uncond) context
    rows, shape (P, 77, D) / (1, 77, D); None for non-text tasks.

    Mirrors the reference txt2img flow: tokenize prompt + empty-string
    uncond, run both through the frozen CLIP text tower
    (scripts/txt2img.py:236-241 + :538-541)."""
    import jax.numpy as jnp

    if task.family != "sd":
        return None, None
    token_ids = getattr(args, "token_ids", None)
    prompts = getattr(args, "prompt", None)
    if token_ids:
        data = np.load(token_ids)
        cond_ids, uncond_ids = data["cond"], data["uncond"]
    elif prompts:
        from qdiffusion_tpu.models.clip_tokenizer import CLIPTokenizer

        tdir = getattr(args, "tokenizer_dir", None)
        if not tdir:
            raise SystemExit("--prompt needs --tokenizer-dir containing "
                             "vocab.json + merges.txt (see docs/PARITY.md)")
        tdir = Path(tdir)
        tok = CLIPTokenizer(tdir / "vocab.json", tdir / "merges.txt")
        cond_ids = tok(prompts, max_length=77)
        uncond_ids = tok([getattr(args, "negative_prompt", "") or ""],
                         max_length=77)
    else:
        logger.warning("sd task without --prompt/--token-ids: sampling "
                       "UNCONDITIONALLY (no CFG)")
        return None, None
    clip_params = load_clip_params(args, task)
    cond = pipe.get_learned_conditioning(clip_params, jnp.asarray(cond_ids))
    uncond = pipe.get_learned_conditioning(clip_params,
                                           jnp.asarray(uncond_ids))
    return cond, uncond


def tile_conditioning(cond, uncond, n):
    """Expand (P, L, D) prompt rows to a batch of n (single prompt tiles;
    P>1 requires n % P == 0, reference txt2img n_samples-per-prompt)."""
    import jax.numpy as jnp

    if cond is None:
        return None, None
    if n % cond.shape[0] != 0:
        raise SystemExit(f"batch {n} not divisible by {cond.shape[0]} prompts")
    cond_n = jnp.tile(cond, (n // cond.shape[0], 1, 1))
    uncond_n = jnp.tile(uncond, (n // uncond.shape[0], 1, 1)) \
        if uncond is not None else None
    return cond_n, uncond_n


def cmd_make_cali_data(args):
    import jax

    from qdiffusion_tpu.config import PRESETS
    from qdiffusion_tpu.utils.run_logging import setup_run_dir

    task = resolve_task(args)
    model, pipe = build_model_and_pipeline(task)
    params = (load_fp_params(args.ckpt, task, model) if args.ckpt
              else jax.jit(model.init_params)(jax.random.PRNGKey(0)))
    rng = jax.random.PRNGKey(args.seed)
    if task.family == "pixel":
        _, traj = pipe.sample(
            params, args.n, timesteps=args.timesteps or task.sampler.timesteps,
            skip_type=task.sampler.skip_type, eta=task.sampler.eta,
            image_size=task.image_size, channels=task.channels, rng=rng,
            return_trajectory=True)
    else:
        cond, uncond = build_conditioning(args, task, pipe)
        cond, uncond = tile_conditioning(cond, uncond, args.n)
        _, traj = pipe.sample(
            params, None, args.n,
            sampler=task.sampler.sample_type
            if task.sampler.sample_type in ("ddim", "plms") else "ddim",
            steps=args.timesteps or task.sampler.timesteps,
            eta=task.sampler.eta, latent_size=task.latent_size,
            latent_channels=task.latent_channels, rng=rng, decode=False,
            cond=cond, uncond=uncond,
            guidance_scale=args.scale if args.scale is not None
            else task.sampler.guidance_scale,
            return_trajectory=True)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **{k: np.asarray(v) for k, v in traj.items()})
    print(f"saved trajectory {[(k, np.asarray(v).shape) for k, v in traj.items()]} -> {out}")


def cmd_calibrate(args):
    import jax

    from qdiffusion_tpu.calib.engine import calibrate
    from qdiffusion_tpu.calib.samples import get_train_samples
    from qdiffusion_tpu.config import PRESETS, QuantFlags
    from qdiffusion_tpu.utils.checkpoints import CalibCheckpointer
    from qdiffusion_tpu.utils.run_logging import dump_config, setup_run_dir

    qflags = QuantFlags(
        weight_bit=args.weight_bit, quant_act=args.quant_act,
        act_bit=args.act_bit, a_sym=args.a_sym, sm_abit=args.sm_abit,
        split=args.split, running_stat=args.running_stat,
        rs_sm_only=args.rs_sm_only, a_min_max=args.a_min_max,
        cali_st=args.cali_st, cali_n=args.cali_n,
        cali_batch_size=args.cali_batch_size, cali_iters=args.cali_iters,
        cali_iters_a=args.cali_iters_a, cali_lr=args.cali_lr,
        cali_p=args.cali_p, precompile=args.precompile,
        alpha_dtype=args.alpha_dtype,
        capture_group_bytes=int(args.capture_group_mb) << 20,
        act_init_batch=args.act_init_batch)
    task = resolve_task(args)
    run_dir = setup_run_dir(args.logdir, f"calib-{task.name}",
                            path=args.run_dir)
    dump_config(run_dir, {"task": task, "quant": qflags, "argv": sys.argv})

    model, pipe = build_model_and_pipeline(task, qflags, args.quant_act)
    params = (load_fp_params(args.ckpt, task, model) if args.ckpt
              else jax.jit(model.init_params)(jax.random.PRNGKey(0)))

    import jax.numpy as jnp

    data = np.load(args.cali_data)
    traj = {k: jnp.asarray(data[k]) for k in data.files}
    cali = get_train_samples(traj, qflags.cali_n, qflags.cali_st,
                             cond=task.family == "sd")
    logger.info("calibration data: %s", [tuple(c.shape) for c in cali])

    qstate0 = None
    if args.resume_w:
        # reference --resume_w: load an already-reconstructed weight
        # qstate and run only the activation pass
        from qdiffusion_tpu.utils.checkpoints import load_qstate

        qstate0 = load_qstate(args.resume_w)
        logger.info("resuming from weight qstate %s", args.resume_w)

    ckptr = CalibCheckpointer(run_dir)
    qstate = calibrate(model, params, cali, qflags.calib_config(),
                       rng=jax.random.PRNGKey(args.seed), qstate=qstate0,
                       checkpointer=ckptr,
                       skip_weight_pass=qstate0 is not None)
    print(f"calibrated quantizer state -> {run_dir / 'qstate.npz'}")


def cmd_convert(args):
    """torch FP checkpoint -> native npz param pytree (one-time step so
    deployments don't need torch installed)."""
    import jax

    from qdiffusion_tpu.config import PRESETS
    from qdiffusion_tpu.utils.checkpoints import save_pytree

    task = resolve_task(args)
    model, _ = build_model_and_pipeline(task)
    params = load_fp_params(args.ckpt, task, model)
    # validate tree structure against the model before persisting
    like = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    jax.tree_util.tree_map(lambda a, b: None, like, params)
    save_pytree(args.out, params)
    print(f"converted {args.ckpt} -> {args.out}")


def cmd_import_qstate(args):
    """Calibrated reference torch checkpoint (QuantModel.state_dict) ->
    native qstate npz (+ optionally the FP params it contains).
    Replaces the reference's resume_cali_model (qdiff/utils.py:382-457)."""
    from qdiffusion_tpu.config import PRESETS, QuantFlags
    from qdiffusion_tpu.quant.torch_interop import import_reference_checkpoint
    from qdiffusion_tpu.utils.checkpoints import save_qstate, save_pytree

    task = resolve_task(args)
    qflags = QuantFlags(weight_bit=args.weight_bit, quant_act=args.quant_act,
                        act_bit=args.act_bit, a_sym=args.a_sym,
                        sm_abit=args.sm_abit, split=args.split)
    model, _ = build_model_and_pipeline(task, qflags, args.quant_act)
    qstate, params = import_reference_checkpoint(
        args.ckpt, model, want_params=bool(args.params_out))
    save_qstate(args.out, qstate)
    print(f"imported qstate ({len(qstate)} sites) -> {args.out}")
    if args.params_out:
        save_pytree(args.params_out, params)
        print(f"extracted FP params -> {args.params_out}")


def build_engine(args, task):
    """Shared model/engine setup for sample + serve: returns
    (model, pipe, params, qstate, mode, model_fn)."""
    import jax

    from qdiffusion_tpu.config import QuantFlags
    from qdiffusion_tpu.deploy import make_quantized_step
    from qdiffusion_tpu.quant.context import QuantMode
    from qdiffusion_tpu.utils.checkpoints import load_qstate

    qflags = QuantFlags(weight_bit=args.weight_bit, quant_act=args.quant_act,
                        act_bit=args.act_bit, a_sym=args.a_sym,
                        sm_abit=args.sm_abit, split=args.split) \
        if args.qstate else None
    model, pipe = build_model_and_pipeline(task, qflags, args.quant_act)
    params = (load_fp_params(args.ckpt, task, model) if args.ckpt
              else jax.jit(model.init_params)(jax.random.PRNGKey(0)))

    qstate, mode, model_fn = None, None, None
    if args.qstate:
        qstate = load_qstate(args.qstate)
        mode = QuantMode(w=True, a=args.quant_act, soft=False)
        if args.engine == "int8" and args.quant_act:
            step = make_quantized_step(model, params, qstate, engine="int8")
            if task.family == "pixel":
                model_fn = step
            else:
                model_fn = lambda x, t, c=None: step(x, t, *(
                    (c,) if c is not None else ()))
        elif args.engine == "fold" and not args.quant_act:
            from qdiffusion_tpu.deploy import fold_weights

            params = fold_weights(model, params, qstate)
            qstate, mode = None, None
        elif args.engine == "stream":
            # weight-only deploy with integer weights resident in HBM
            step = make_quantized_step(
                model, params, qstate, engine="stream",
                stream_convs=getattr(args, "stream_convs", False))
            if task.family == "pixel":
                model_fn = step
            else:
                model_fn = lambda x, t, c=None: step(x, t, *(
                    (c,) if c is not None else ()))
            qstate, mode = None, None
    return model, pipe, params, qstate, mode, model_fn


def _cast_float_tree(tree, dtype):
    """Cast floating leaves (params/VAE) to the deployment dtype."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


def cmd_sample(args):
    import jax
    import jax.numpy as jnp

    from qdiffusion_tpu.config import PRESETS
    from qdiffusion_tpu.utils.run_logging import Throughput, save_images_png

    task = resolve_task(args)
    model, pipe, params, qstate, mode, model_fn = build_engine(args, task)
    # --dtype bfloat16: full-bf16 deployment — params cast here, VAE below;
    # make_generate_fn then picks the bf16 evaluation carrier (the f32
    # scheduler math stays f32 inside the samplers). Engines with their own
    # jitted closure (int8/stream) manage carriers internally.
    bf16 = getattr(args, "dtype", "float32") == "bfloat16" \
        and model_fn is None
    if bf16:
        params = _cast_float_tree(params, jnp.bfloat16)

    cond, uncond = build_conditioning(args, task, pipe) \
        if task.family == "sd" else (None, None)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    # resolved-config dump next to the outputs (reference behavior:
    # sampling_config.yaml written into the logdir,
    # sample_diffusion_ldm.py:Sample logdir setup)
    from qdiffusion_tpu.utils.run_logging import dump_config

    dump_config(out_dir, {
        "task": task,
        "quant": {"qstate": args.qstate, "engine": args.engine,
                  "weight_bit": args.weight_bit, "quant_act": args.quant_act,
                  "act_bit": args.act_bit, "sm_abit": args.sm_abit,
                  "split": args.split, "dtype": getattr(args, "dtype", None)},
        "argv": sys.argv})
    rng = jax.random.PRNGKey(args.seed)
    batch = args.batch
    n_dev = len(jax.devices())
    dp = (args.dp or args.mesh) and n_dev > 1
    mesh = None
    if dp:
        # data-parallel FID sampling: replicate params, shard the batch
        # over the mesh; the scan-sampler runs SPMD with zero collectives.
        # --mesh 'dcn:H,data:N' builds the hybrid multi-host layout.
        from qdiffusion_tpu.parallel.mesh import (
            make_mesh, parse_mesh_spec, replicate)

        mesh = parse_mesh_spec(args.mesh) if args.mesh else make_mesh()
        params = replicate(params, mesh)
        batch = (batch // n_dev) * n_dev or n_dev
        logger.info("data-parallel sampling over %s mesh, batch %d",
                    dict(zip(mesh.axis_names, mesh.devices.shape)), batch)

    vae_params = load_vae_params(args, task) \
        if task.family != "pixel" else None
    if bf16 and vae_params is not None:
        vae_params = _cast_float_tree(vae_params, jnp.bfloat16)
    # one jitted program per batch shape with the param trees as jit
    # ARGUMENTS — the eager pipe.sample path re-traces the sampler scan on
    # the host every batch (measured ~20 s/batch overhead on the remote
    # tunnel vs ~1 s of device time; serving.py). Under --dp/--mesh the
    # same program is jitted with batch-dim shardings (SPMD).
    from qdiffusion_tpu.serving import make_generate_fn

    gen = make_generate_fn(
        task, params, vae_params, pipe=pipe, model=model,
        qstate=qstate, mode=mode, model_fn=model_fn,
        sampler=args.sampler, steps=args.timesteps,
        guidance_scale=args.scale,
        uncond=uncond[0] if uncond is not None else None, mesh=mesh)
    if dp and model_fn is not None:
        gen = None  # pre-jitted engine closures keep the legacy DP path
    idx = 0
    tput = Throughput()
    all_images = [] if args.npz_out else None
    safety = None
    if getattr(args, "safety_ckpt", None):
        # reference txt2img.py:29-37,96-102 (its call site is commented
        # out at :558; here it is an opt-in flag)
        from qdiffusion_tpu.models.safety import (
            SafetyChecker, config_from_sd, convert_safety_checker)
        from qdiffusion_tpu.utils.checkpoints import load_torch_checkpoint

        ssd = load_torch_checkpoint(Path(args.safety_ckpt))
        checker = SafetyChecker(config_from_sd(ssd))
        safety_params = convert_safety_checker(ssd)
        safety = jax.jit(checker.apply)
    while idx < args.n:
        n = min(batch, args.n - idx)
        rng, sub = jax.random.split(rng)
        if gen is not None:
            # per-item seeds: deterministic per --seed and image index,
            # independent of batching
            n_eff = n if mesh is None else -(-n // n_dev) * n_dev
            seeds = np.arange(idx, idx + n_eff, dtype=np.int64) \
                + np.int64(args.seed) * 1000003
            cond_n, _ = tile_conditioning(cond, uncond, n_eff)
            imgs = gen(seeds, cond_n)[:n]  # drop mesh-padding items
        elif task.family == "pixel":
            x, _ = pipe.sample(params, n,
                               timesteps=args.timesteps or task.sampler.timesteps,
                               skip_type=task.sampler.skip_type,
                               eta=task.sampler.eta,
                               sample_type=args.sampler
                               or task.sampler.sample_type,
                               image_size=task.image_size,
                               channels=task.channels, rng=sub,
                               qstate=qstate, mode=mode, model_fn=model_fn)
            imgs = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
        else:
            cond_n, uncond_n = tile_conditioning(cond, uncond, n)
            imgs, _ = pipe.sample(
                params, vae_params, n,
                sampler=args.sampler or task.sampler.sample_type,
                steps=args.timesteps or task.sampler.timesteps,
                eta=task.sampler.eta, latent_size=task.latent_size,
                latent_channels=task.latent_channels, rng=sub,
                cond=cond_n, uncond=uncond_n,
                guidance_scale=args.scale if args.scale is not None
                else task.sampler.guidance_scale,
                qstate=qstate, mode=mode, model_fn=model_fn)
        tput.log(n)
        if safety is not None:
            imgs, nsfw = safety(safety_params, imgs)
            n_flag = int(np.asarray(nsfw).sum())
            if n_flag:
                print(f"safety: blacked out {n_flag}/{n} flagged image(s)")
        if getattr(args, "watermark", None):
            # invisible watermark on every output, reference
            # txt2img.py:493-495 + :560-584 (in-repo encoder, no cv2 dep)
            from qdiffusion_tpu.utils.watermark import embed_watermark

            arr = (np.clip(np.asarray(imgs), 0, 1) * 255.0).round().astype(
                np.uint8)
            imgs = jnp.asarray(np.stack([
                embed_watermark(im, args.watermark) for im in arr])) / 255.0
        if all_images is not None:
            all_images.append(
                (np.asarray(imgs) * 255.0).astype(np.uint8))
        idx = save_images_png(imgs, out_dir, idx)
    if all_images is not None:
        # bulk uint8 dump for FID tooling, reference
        # scripts/sample_diffusion_ldm.py:160-164 ({N}x{H}x{W}x{C}-samples.npz)
        all_img = np.concatenate(all_images, axis=0)[: args.n]
        npdir = Path(args.npz_out)
        if npdir.suffix == ".npz":
            nppath = npdir
        else:
            shape_str = "x".join(str(s) for s in all_img.shape)
            nppath = npdir / f"{shape_str}-samples.npz"
        nppath.parent.mkdir(parents=True, exist_ok=True)
        np.savez(nppath, all_img)
        print(f"wrote bulk dump {all_img.shape} -> {nppath}")
    print(f"wrote {idx} images to {out_dir}")


def cmd_serve(args):
    """Serving daemon: microbatching HTTP server over a deployed engine
    (no reference counterpart — its entry points are one-shot scripts)."""
    import jax.numpy as jnp

    from qdiffusion_tpu.config import PRESETS
    from qdiffusion_tpu.serving import (
        DiffusionServer, Request, ServerConfig, make_generate_fn, serve_http)

    task = resolve_task(args)
    model, pipe, params, qstate, mode, model_fn = build_engine(args, task)
    vae_params = load_vae_params(args, task) if task.family != "pixel" \
        else None
    if getattr(args, "dtype", "float32") == "bfloat16" and model_fn is None:
        import jax.numpy as jnp

        params = _cast_float_tree(params, jnp.bfloat16)
        if vae_params is not None:
            vae_params = _cast_float_tree(vae_params, jnp.bfloat16)

    encode_cond = None
    uncond = None
    if task.family == "sd" and args.tokenizer_dir:
        from qdiffusion_tpu.models.clip_tokenizer import CLIPTokenizer

        tdir = Path(args.tokenizer_dir)
        tok = CLIPTokenizer(tdir / "vocab.json", tdir / "merges.txt")
        clip_params = load_clip_params(args, task)

        def encode_cond(req: Request):
            prompt = req.prompt or ""
            ids = tok([prompt], max_length=77)
            return np.asarray(pipe.get_learned_conditioning(
                clip_params, jnp.asarray(ids)))[0]

        uncond_ids = tok([args.negative_prompt or ""], max_length=77)
        uncond = pipe.get_learned_conditioning(clip_params,
                                               jnp.asarray(uncond_ids))[0]

    generate = make_generate_fn(
        task, params, vae_params, pipe=pipe, model=model, qstate=qstate,
        mode=mode, model_fn=model_fn, sampler=args.sampler,
        steps=args.timesteps, guidance_scale=args.scale, uncond=uncond)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    server = DiffusionServer(
        generate, ServerConfig(batch_buckets=buckets,
                               max_wait_ms=args.max_wait_ms,
                               max_queue=args.max_queue),
        encode_cond=encode_cond)
    if args.warmup:
        # compile every bucket before accepting traffic
        for b in buckets:
            server.generate(Request(n=b, seed=0))
        logger.info("warmup done: %s", server.stats())
    httpd = serve_http(server, host=args.host, port=args.port)
    print(f"serving {task.name} (engine={args.engine}) on "
          f"http://{httpd.server_address[0]}:{httpd.server_address[1]}",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


def load_vae_params(args, task):
    from qdiffusion_tpu.models.torch_import import state_dict_to_pytree
    from qdiffusion_tpu.utils.checkpoints import load_torch_checkpoint

    if not getattr(args, "vae_ckpt", None):
        raise SystemExit("--vae-ckpt required for latent-space tasks")
    if Path(args.vae_ckpt).suffix == ".npz":  # native tree, torch-free
        from qdiffusion_tpu.utils.checkpoints import load_nested

        return load_nested(args.vae_ckpt)
    sd = load_torch_checkpoint(args.vae_ckpt, subtree="first_stage_model.")
    if not sd:
        sd = load_torch_checkpoint(args.vae_ckpt)
    return state_dict_to_pytree(sd)


def cmd_fid(args):
    """Score two sample sets (PNG dirs or bulk npz dumps) with the native
    FID-Inception extractor (reference protocol: 50k samples,
    torch-fidelity; README.md:103). The second side can be precomputed
    statistics (--ref-stats, a mu/sigma npz — the standard way to score
    against a 50k reference set without re-extracting it every run);
    --save-stats persists set1's statistics for later reuse."""
    import json

    from qdiffusion_tpu.metrics.fid import (
        InceptionExtractor, compute_statistics, frechet_distance)

    if bool(args.set2) == bool(args.ref_stats):
        raise SystemExit("pass exactly one of --set2 or --ref-stats")
    extractor = InceptionExtractor(args.inception, batch_size=args.batch)

    def load_set(path):
        p = Path(path)
        if p.suffix == ".npz":
            data = np.load(p)
            return data[data.files[0]]
        from PIL import Image

        files = sorted(p.glob("*.png"))
        if not files:
            raise SystemExit(f"no .png files in {p}")
        return np.stack([np.asarray(Image.open(f)) for f in files])

    f1 = extractor(load_set(args.set1))
    mu1, s1 = compute_statistics(f1)
    if args.save_stats:
        np.savez(args.save_stats, mu=mu1, sigma=s1, n=len(f1))
    if args.ref_stats:
        ref = np.load(args.ref_stats)
        mu2, s2, n2 = ref["mu"], ref["sigma"], int(ref.get("n", 0))
    else:
        f2 = extractor(load_set(args.set2))
        mu2, s2 = compute_statistics(f2)
        n2 = len(f2)
    fid = frechet_distance(mu1, s1, mu2, s2)
    print(json.dumps({"fid": round(fid, 4), "n1": len(f1), "n2": n2}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="qdiffusion_tpu")
    p.add_argument("--compile-cache", metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "restarting serve/sample skips every warm compile "
                        "(verified to work through remote-compile tunnels)")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_quant_flags(sp):
        sp.add_argument("--weight-bit", type=int, default=8)
        sp.add_argument("--quant-act", action="store_true")
        sp.add_argument("--act-bit", type=int, default=8)
        sp.add_argument("--a-sym", action="store_true")
        sp.add_argument("--sm-abit", type=int, default=8)
        sp.add_argument("--split", action="store_true")
        sp.add_argument("--running-stat", action="store_true")
        sp.add_argument("--rs-sm-only", action="store_true",
                        help="running stats only for post-softmax quantizers")
        sp.add_argument("--a-min-max", action="store_true",
                        help="act scale init 'max' instead of 'mse' (LDM)")

    def add_prompt_flags(sp):
        sp.add_argument("--prompt", action="append",
                        help="text prompt (repeatable; SD tasks)")
        sp.add_argument("--negative-prompt", default="",
                        help="CFG negative prompt (default: empty string)")
        sp.add_argument("--token-ids",
                        help="npz with precomputed 'cond'/'uncond' CLIP ids "
                             "(alternative to --prompt)")
        sp.add_argument("--tokenizer-dir",
                        help="dir with CLIP vocab.json + merges.txt")
        sp.add_argument("--clip-ckpt",
                        help="CLIP text weights (default: the SD --ckpt)")
        sp.add_argument("--scale", type=float,
                        help="CFG guidance scale (default: task preset)")

    sp = sub.add_parser("make-cali-data")
    sp.add_argument("--task")
    sp.add_argument("--config", metavar="YAML", help="reference-format model YAML (alternative to --task)")
    sp.add_argument("--ckpt")
    sp.add_argument("--n", type=int, default=256)
    sp.add_argument("--timesteps", type=int)
    sp.add_argument("--seed", type=int, default=1234)
    sp.add_argument("--out", required=True)
    add_prompt_flags(sp)
    sp.set_defaults(fn=cmd_make_cali_data)

    sp = sub.add_parser("calibrate")
    sp.add_argument("--task")
    sp.add_argument("--config", metavar="YAML", help="reference-format model YAML (alternative to --task)")
    sp.add_argument("--ckpt")
    sp.add_argument("--cali-data", required=True)
    sp.add_argument("--resume-w", help="weight-pass qstate to resume from")
    add_quant_flags(sp)
    sp.add_argument("--cali-st", type=int, default=20)
    sp.add_argument("--cali-n", type=int, default=256)
    sp.add_argument("--cali-batch-size", type=int, default=32)
    sp.add_argument("--cali-iters", type=int, default=20000)
    sp.add_argument("--cali-iters-a", type=int, default=5000)
    sp.add_argument("--cali-lr", type=float, default=4e-4)
    sp.add_argument("--cali-p", type=float, default=2.4)
    sp.add_argument("--capture-group-mb", type=int, default=3072,
                    help="grouped-capture residency cap in MB (smaller = "
                         "more groups/compiles, lower HBM peak)")
    sp.add_argument("--alpha-dtype", choices=("float32", "bfloat16"),
                    default="float32",
                    help="AdaRound alpha storage dtype; bfloat16 halves "
                         "the weight-sized alpha tree's HBM residency "
                         "(required headroom for SD-scale calibration on "
                         "a 16 GB chip) — optimization still runs in f32")
    sp.add_argument("--act-init-batch", type=int, default=64,
                    help="act scale-init / running-stat sweep batch "
                         "(reference 64; cap it at SD scale — a batch-64 "
                         "full forward's activation peak vs 16 GB HBM)")
    sp.add_argument("--precompile", type=int, default=4, metavar="N",
                    help="AOT-compile recon runners + capture sweeps on N "
                         "background threads before each unit loop (0=off; "
                         "default 4: compile/compile overlap measured 2.61x "
                         "on the remote compile server, docs/E2E_RUN.md "
                         "precompile thread-count study)")
    sp.add_argument("--logdir", default="logs")
    sp.add_argument("--run-dir", default=None,
                    help="reuse an EXISTING run directory: resumes from "
                         "its calib_progress.json checkpoint (reference "
                         "mid-calibration temp ckpts, txt2img.py:422-428)")
    sp.add_argument("--seed", type=int, default=1234)
    sp.set_defaults(fn=cmd_calibrate)

    sp = sub.add_parser("convert")
    sp.add_argument("--task")
    sp.add_argument("--config", metavar="YAML", help="reference-format model YAML (alternative to --task)")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("fid")
    sp.add_argument("--set1", required=True, help="PNG dir or samples npz")
    sp.add_argument("--set2", help="PNG dir or samples npz")
    sp.add_argument("--ref-stats", metavar="NPZ",
                    help="precomputed mu/sigma statistics instead of --set2")
    sp.add_argument("--save-stats", metavar="NPZ",
                    help="persist set1 statistics (mu/sigma) for reuse")
    sp.add_argument("--inception", required=True,
                    help="pt_inception checkpoint path (external artifact)")
    sp.add_argument("--batch", type=int, default=64)
    sp.set_defaults(fn=cmd_fid)

    sp = sub.add_parser("import-qstate")
    sp.add_argument("--task")
    sp.add_argument("--config", metavar="YAML", help="reference-format model YAML (alternative to --task)")
    sp.add_argument("--ckpt", required=True,
                    help="calibrated reference ckpt (QuantModel.state_dict)")
    sp.add_argument("--out", required=True, help="qstate npz output")
    sp.add_argument("--params-out",
                    help="also extract the FP param pytree to this npz")
    add_quant_flags(sp)
    sp.set_defaults(fn=cmd_import_qstate)

    sp = sub.add_parser("sample")
    sp.add_argument("--task")
    sp.add_argument("--config", metavar="YAML", help="reference-format model YAML (alternative to --task)")
    sp.add_argument("--ckpt")
    sp.add_argument("--vae-ckpt")
    sp.add_argument("--qstate")
    add_quant_flags(sp)
    sp.add_argument("--engine", default="sim",
                    choices=["sim", "fold", "int8", "stream"])
    sp.add_argument("--stream-convs", action="store_true",
                    help="stream engine: keep conv weights int8/int4 in "
                         "HBM via the Pallas patch-matmul kernels; a "
                         "per-site byte cost model picks stream vs fold "
                         "(batch-1 serving)")
    sp.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="deployment dtype for sim/fold engines: bfloat16 "
                         "casts params+VAE and runs the UNet/decoder with "
                         "a bf16 carrier (2x MXU rate; scheduler math "
                         "stays f32)")
    sp.add_argument("--sampler")
    sp.add_argument("--n", type=int, default=64)
    sp.add_argument("--batch", type=int, default=64)
    sp.add_argument("--timesteps", type=int)
    sp.add_argument("--seed", type=int, default=1234)
    sp.add_argument("--out", default="samples")
    sp.add_argument("--npz-out",
                    help="also dump all samples as one uint8 npz (dir -> "
                         "NxHxWxC-samples.npz, or an explicit .npz path)")
    sp.add_argument("--watermark",
                    help="invisible-watermark payload stamped on every "
                         "output image (reference txt2img.py:493-495)")
    sp.add_argument("--safety-ckpt",
                    help="safety-checker weights (torch .ckpt/.pt state_dict "
                         "or converted npz pytree); flagged images are "
                         "blacked out (reference txt2img.py:96-102)")
    sp.add_argument("--dp", action="store_true",
                    help="shard the sampling batch over all devices")
    sp.add_argument("--mesh",
                    help="mesh spec: 'data:N' or 'dcn:H,data:N' (multi-host "
                         "hybrid; call parallel.mesh.distributed_init first "
                         "on each process)")
    add_prompt_flags(sp)
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser("serve", help="microbatching HTTP serving daemon")
    sp.add_argument("--task")
    sp.add_argument("--config", metavar="YAML", help="reference-format model YAML (alternative to --task)")
    sp.add_argument("--ckpt")
    sp.add_argument("--vae-ckpt")
    sp.add_argument("--qstate")
    add_quant_flags(sp)
    sp.add_argument("--engine", default="fold",
                    choices=["sim", "fold", "int8", "stream"])
    sp.add_argument("--stream-convs", action="store_true",
                    help="stream engine: conv weights resident in HBM "
                         "(Pallas patch-matmul)")
    sp.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="deployment dtype for sim/fold engines (see "
                         "sample --dtype)")
    sp.add_argument("--sampler")
    sp.add_argument("--timesteps", type=int)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8470)
    sp.add_argument("--buckets", default="1,2,4,8",
                    help="batch buckets (one compiled program each)")
    sp.add_argument("--max-wait-ms", type=float, default=20.0)
    sp.add_argument("--max-queue", type=int, default=256)
    sp.add_argument("--warmup", action="store_true",
                    help="compile every bucket before accepting traffic")
    add_prompt_flags(sp)
    sp.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.compile_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    args.fn(args)


if __name__ == "__main__":
    main()
