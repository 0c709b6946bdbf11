"""End-to-end pipeline tests: latent diffusion with VAE decode, SD-style
conditioning with CFG + calibration trajectory, pixel pipeline samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
from qdiffusion_tpu.models.vae import VAE, VAEConfig
from qdiffusion_tpu.pipelines import (
    LatentDiffusionPipeline,
    PixelDiffusionPipeline,
)
from qdiffusion_tpu.schedules import NoiseSchedule

LDM_TINY = LDMUNetConfig(
    image_size=8, in_channels=3, out_channels=3, model_channels=32,
    num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
    num_heads=4)

VAE_TINY = VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), in_channels=3, resolution=16,
                     z_channels=3, double_z=False, embed_dim=3, n_embed=32)

SD_TINY = LDMUNetConfig(
    image_size=8, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=16)


def _vae_params(vae, rng):
    """Random VAE params matching the decoder/encoder tree structure."""
    cfg = vae.cfg
    keys = iter(jax.random.split(rng, 512))

    def conv(ci, co, k):
        return {"w": jax.random.normal(next(keys), (k, k, ci, co)) * 0.05,
                "b": jnp.zeros((co,))}

    def norm(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def resnet(ci, co):
        p = {"norm1": norm(ci), "conv1": conv(ci, co, 3), "norm2": norm(co),
             "conv2": conv(co, co, 3)}
        if ci != co:
            p["nin_shortcut"] = conv(ci, co, 1)
        return p

    def attn(c):
        return {"norm": norm(c), "q": conv(c, c, 1), "k": conv(c, c, 1),
                "v": conv(c, c, 1), "proj_out": conv(c, c, 1)}

    mults = (1,) + tuple(cfg.ch_mult)
    dec_block_in = cfg.ch * cfg.ch_mult[-1]
    dec = {"conv_in": conv(cfg.z_channels, dec_block_in, 3),
           "mid": {"block_1": resnet(dec_block_in, dec_block_in),
                   "attn_1": attn(dec_block_in),
                   "block_2": resnet(dec_block_in, dec_block_in)},
           "up": {}}
    block_in = dec_block_in
    for i in reversed(range(len(cfg.ch_mult))):
        block_out = cfg.ch * cfg.ch_mult[i]
        lvl = {"block": {}}
        for j in range(cfg.num_res_blocks + 1):
            lvl["block"][str(j)] = resnet(block_in, block_out)
            block_in = block_out
        if i != 0:
            lvl["upsample"] = {"conv": conv(block_in, block_in, 3)}
        dec["up"][str(i)] = lvl
    dec["norm_out"] = norm(block_in)
    dec["conv_out"] = conv(block_in, cfg.out_ch, 3)

    params = {"decoder": dec,
              "post_quant_conv": conv(cfg.embed_dim, cfg.z_channels, 1)}
    if cfg.n_embed:
        params["quantize"] = {"embedding": {
            "weight": jax.random.normal(next(keys),
                                        (cfg.n_embed, cfg.embed_dim))}}
    return params


def test_latent_pipeline_vq_decode():
    unet = LDMUNet(LDM_TINY)
    vae = VAE(VAE_TINY)
    sched = NoiseSchedule.ldm("linear", 100, 0.0015, 0.0195)
    pipe = LatentDiffusionPipeline(unet=unet, vae=vae, schedule=sched)
    params = unet.init_params(jax.random.PRNGKey(0))
    vae_params = _vae_params(vae, jax.random.PRNGKey(1))
    imgs, _ = pipe.sample(params, vae_params, 2, sampler="ddim", steps=5,
                          eta=1.0, latent_size=8, latent_channels=3)
    assert imgs.shape == (2, 16, 16, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0


def test_sd_pipeline_plms_cfg_and_trajectory():
    unet = LDMUNet(SD_TINY)
    vae = VAE(VAE_TINY)
    sched = NoiseSchedule.ldm("linear", 100, 0.00085, 0.012)
    pipe = LatentDiffusionPipeline(unet=unet, vae=vae, schedule=sched,
                                   scale_factor=0.18, conditioning_key="crossattn")
    params = unet.init_params(jax.random.PRNGKey(0))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    uncond = jnp.zeros_like(cond)
    z, traj = pipe.sample(params, None, 2, sampler="plms", steps=6,
                          latent_size=8, latent_channels=4,
                          cond=cond, uncond=uncond, guidance_scale=7.5,
                          decode=False, return_trajectory=True)
    assert z.shape == (2, 8, 8, 4)
    # uniform discretization may overshoot the requested step count
    # (reference make_ddim_timesteps semantics): 100//6 stride -> 7 steps
    S = traj["xs"].shape[0]
    assert S in (6, 7)
    # SD calibration data layout: cond/uncond stacked per step
    assert traj["cs"].shape == (S, 2, 5, 16)
    assert traj["ucs"].shape == (S, 2, 5, 16)

    from qdiffusion_tpu.calib.samples import get_train_samples

    xs, ts, cs = get_train_samples(traj, cali_n=2, cali_st=3, cond=True)
    assert xs.shape[0] == ts.shape[0] == cs.shape[0]
    n_slices = len(range(0, S, S // 3))
    assert xs.shape[0] == 2 * n_slices * 2  # cond+uncond halves


def test_pixel_pipeline_dpm_solver():
    model = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                    attn_resolutions=(), resolution=8))
    sched = NoiseSchedule.ddpm("linear", 1e-4, 0.02, 100)
    pipe = PixelDiffusionPipeline(model, sched)
    params = model.init_params(jax.random.PRNGKey(0))
    x, _ = pipe.sample(params, 2, timesteps=6, sample_type="dpm_solver",
                       image_size=8, channels=3)
    assert x.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(x)).all()
