"""End-to-end generation pipelines: model + sampler + first stage.

Functional equivalent of the reference LatentDiffusion scaffolding
(ldm/models/diffusion/ddpm.py): conditioning dispatch (None / concat /
crossattn / hybrid, DiffusionWrapper.forward :1419-1445), first-stage
scale_factor handling (:545-553, :710-767), and text conditioning via the
CLIP encoder (get_learned_conditioning :555-566).

A pipeline owns only static structure and pure functions; all state
(params, qstate) is passed per call so the same pipeline serves FP,
simulated-quant, and int8-deployed models.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.vae import VAE
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode
from qdiffusion_tpu.samplers.ddim import ddim_sample, ddpm_sample
from qdiffusion_tpu.samplers.dpm_solver import NoiseScheduleVP, dpm_solver_sample
from qdiffusion_tpu.samplers.ldm import DDIMTables, ddim_sample_ldm, plms_sample
from qdiffusion_tpu.schedules import NoiseSchedule, make_skip_sequence

Array = jnp.ndarray


@dataclasses.dataclass
class PixelDiffusionPipeline:
    """CIFAR/LSUN pixel-space DDIM pipeline
    (reference scripts/sample_diffusion_ddim.py Diffusion runner)."""

    model: object  # DDIMUNet
    schedule: NoiseSchedule

    def model_fn(self, params: dict, qstate: Optional[dict] = None,
                 mode: Optional[QuantMode] = None) -> Callable:
        def fn(x, t):
            ctx = QuantCtx(qstate, mode=mode) if qstate is not None else None
            return self.model.apply(params, x, t, ctx)

        return fn

    def sample(self, params: dict, n: int, *, timesteps: int = 100,
               skip_type: str = "uniform", eta: float = 0.0,
               sample_type: str = "generalized", image_size: int = 32,
               channels: int = 3, rng: Optional[jax.Array] = None,
               qstate: Optional[dict] = None,
               mode: Optional[QuantMode] = None,
               model_fn: Optional[Callable] = None,
               return_trajectory: bool = False,
               x_init: Optional[jax.Array] = None,
               eval_dtype=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, sub = jax.random.split(rng)
        # x_init lets callers supply the initial noise (e.g. the serving
        # harness draws it per-item so results don't depend on batching)
        x = x_init if x_init is not None else jax.random.normal(
            sub, (n, image_size, image_size, channels))
        fn = model_fn or self.model_fn(params, qstate, mode)
        if sample_type == "generalized":
            seq = make_skip_sequence(self.schedule.num_timesteps, timesteps,
                                    skip_type)
            return ddim_sample(fn, x, seq, self.schedule.betas, eta=eta,
                               rng=rng, return_trajectory=return_trajectory,
                               eval_dtype=eval_dtype)
        if sample_type == "ddpm_noisy":
            seq = make_skip_sequence(self.schedule.num_timesteps, timesteps,
                                    skip_type)
            return ddpm_sample(fn, x, seq, self.schedule.betas, rng=rng,
                               return_trajectory=return_trajectory,
                               eval_dtype=eval_dtype)
        if sample_type == "dpm_solver":
            ns = NoiseScheduleVP("discrete", betas=self.schedule.betas)
            out = dpm_solver_sample(fn, x, ns, steps=timesteps, order=3,
                                    skip_type="time_uniform",
                                    method="singlestep",
                                    eval_dtype=eval_dtype)
            return out, None
        raise NotImplementedError(sample_type)


@dataclasses.dataclass
class LatentDiffusionPipeline:
    """LDM / Stable Diffusion pipeline: UNet in latent space + first-stage
    decode (+ CLIP text conditioning for SD)."""

    unet: object  # LDMUNet
    vae: VAE
    schedule: NoiseSchedule
    scale_factor: float = 1.0
    conditioning_key: Optional[str] = None  # None | 'crossattn' | 'concat'
    text_encoder: Optional[object] = None  # CLIPTextEncoder

    def model_fn(self, params: dict, qstate: Optional[dict] = None,
                 mode: Optional[QuantMode] = None) -> Callable:
        """(x, t, context) -> eps with conditioning dispatch
        (DiffusionWrapper.forward, ddpm.py:1419-1445). For 'hybrid' the
        context is a dict {'c_concat': ..., 'c_crossattn': ...}; for 'adm'
        it is the (B,) int class labels fed to the label embedding."""

        def fn(x, t, context=None):
            ctx = QuantCtx(qstate, mode=mode) if qstate is not None else None
            if self.conditioning_key in (None, "crossattn"):
                return self.unet.apply(params, x, t, ctx, context=context)
            if self.conditioning_key == "concat":
                xc = jnp.concatenate([x, context], axis=-1)
                return self.unet.apply(params, xc, t, ctx)
            if self.conditioning_key == "hybrid":
                xc = jnp.concatenate([x, context["c_concat"]], axis=-1)
                return self.unet.apply(params, xc, t, ctx,
                                       context=context["c_crossattn"])
            if self.conditioning_key == "adm":
                return self.unet.apply(params, x, t, ctx, y=context)
            raise NotImplementedError(self.conditioning_key)

        return fn

    def get_learned_conditioning(self, clip_params: dict,
                                 input_ids: Array) -> Array:
        assert self.text_encoder is not None
        return self.text_encoder.apply(clip_params, input_ids)

    def decode_first_stage(self, vae_params: dict, z: Array) -> Array:
        z = z / self.scale_factor
        return self.vae.decode(vae_params, z)

    def encode_first_stage(self, vae_params: dict, x: Array,
                           rng: Optional[jax.Array] = None) -> Array:
        if self.vae.cfg.n_embed is not None:
            z = self.vae.encode_moments(vae_params, x)
        else:
            z = self.vae.encode_kl(vae_params, x, rng=rng)
        return self.scale_factor * z

    def sample(self, params: dict, vae_params: dict, n: int, *,
               sampler: str = "ddim", steps: int = 50, eta: float = 0.0,
               latent_size: int = 64, latent_channels: int = 4,
               cond: Optional[Array] = None, uncond: Optional[Array] = None,
               guidance_scale: float = 1.0,
               rng: Optional[jax.Array] = None,
               qstate: Optional[dict] = None,
               mode: Optional[QuantMode] = None,
               model_fn: Optional[Callable] = None,
               decode: bool = True,
               return_trajectory: bool = False,
               x_init: Optional[jax.Array] = None,
               eval_dtype=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, sub = jax.random.split(rng)
        x = x_init if x_init is not None else jax.random.normal(
            sub, (n, latent_size, latent_size, latent_channels))
        fn = model_fn or self.model_fn(params, qstate, mode)
        ac = self.schedule.alphas_cumprod
        if sampler == "ddim":
            tables = DDIMTables.build(ac, steps, eta)
            z, traj = ddim_sample_ldm(fn, x, tables, cond=cond, uncond=uncond,
                                      guidance_scale=guidance_scale,
                                      eta_noise=eta > 0, rng=rng,
                                      return_trajectory=return_trajectory,
                                      eval_dtype=eval_dtype)
        elif sampler == "plms":
            tables = DDIMTables.build(ac, steps, 0.0)
            z, traj = plms_sample(fn, x, tables, cond=cond, uncond=uncond,
                                  guidance_scale=guidance_scale, rng=rng,
                                  return_trajectory=return_trajectory,
                                  eval_dtype=eval_dtype)
        elif sampler == "dpm_solver":
            ns = NoiseScheduleVP("discrete", betas=self.schedule.betas)
            z = dpm_solver_sample(fn, x, ns, steps=steps, order=2,
                                  method="multistep", cond=cond,
                                  uncond=uncond,
                                  guidance_scale=guidance_scale,
                                  eval_dtype=eval_dtype)
            traj = None
        else:
            raise NotImplementedError(sampler)
        if traj is not None and cond is not None:
            # SD calibration data needs (cond, uncond) per step (reference
            # plms.py:166-171)
            S = traj["xs"].shape[0]
            traj["cs"] = jnp.broadcast_to(cond[None], (S, *cond.shape))
            traj["ucs"] = jnp.broadcast_to(uncond[None], (S, *uncond.shape))
        if not decode:
            return z, traj
        # bf16 deployment: decode in the carrier too (f32 latents against
        # bf16 VAE params would upcast the whole decoder); clip back in f32
        zin = z if eval_dtype is None else z.astype(eval_dtype)
        img = self.decode_first_stage(vae_params, zin)
        if eval_dtype is not None:
            img = img.astype(jnp.float32)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0), traj
