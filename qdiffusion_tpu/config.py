"""Structured configuration for models, samplers, and quantization.

One dataclass tree replaces the reference's three-layer flag system
(argparse + YAML model configs + in-script quantizer dicts; SURVEY §5).
Presets reproduce the reference model zoo configs:
  * cifar10: configs/cifar10.yml + sample_diffusion_ddim.py defaults
  * lsun_beds256 / lsun_churches256: models/ldm/*/config.yaml
  * sd_v1: configs/stable-diffusion/v1-inference.yaml
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from qdiffusion_tpu.models.clip_text import CLIPTextConfig
from qdiffusion_tpu.models.unet_ddim import DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.models.unet_ldm import LDMQuantPolicy, LDMUNetConfig
from qdiffusion_tpu.models.vae import VAEConfig
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.calib.engine import CalibConfig
from qdiffusion_tpu.calib.recon import ReconConfig


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    kind: str = "ddpm"  # 'ddpm' (get_beta_schedule) | 'ldm' (make_beta_schedule)
    beta_schedule: str = "linear"
    beta_start: float = 1e-4
    beta_end: float = 2e-2
    num_timesteps: int = 1000


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    sample_type: str = "generalized"  # generalized|ddpm_noisy|dpm_solver|ddim|plms
    timesteps: int = 100
    skip_type: str = "quad"
    eta: float = 0.0
    guidance_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class QuantFlags:
    """CLI-level quantization knobs (reference --weight_bit etc.)."""

    weight_bit: int = 8
    quant_act: bool = False
    act_bit: int = 8
    a_sym: bool = False
    sm_abit: int = 8
    split: bool = False
    running_stat: bool = False
    rs_sm_only: bool = False
    a_min_max: bool = False  # LDM: act scale init 'max' instead of 'mse'
    cali_st: int = 20
    cali_n: int = 256
    cali_batch_size: int = 32
    cali_iters: int = 20000
    cali_iters_a: int = 5000
    cali_lr: float = 4e-4
    cali_p: float = 2.4
    precompile: int = 4  # AOT compile threads for recon/capture programs
    # (4: remote compile/compile overlap measured 2.61x, E2E_RUN.md study)
    alpha_dtype: str = "float32"  # AdaRound alpha storage dtype
    # ('bfloat16' halves the weight-sized alpha tree — see
    # calib.engine.CalibConfig.alpha_dtype)
    capture_group_bytes: int = 3 << 30  # grouped-capture residency cap
    # (smaller = more groups = more compiles but lower HBM peak)
    act_init_batch: int = 64  # act scale-init / running-stat sweep batch
    # (reference uses 64, sample_diffusion_ddim.py:203-208; at SD scale a
    # batch-64 full forward's activation peak needs capping on 16 GB)

    def policy_ddim(self) -> QuantPolicy:
        """CIFAR policy: 'max' scale methods (sample_diffusion_ddim.py:129-139)."""
        return QuantPolicy(
            wq=AffineQuantizerSpec(n_bits=self.weight_bit, channel_wise=True,
                                   channel_axis=-1, scale_method="max"),
            aq=AffineQuantizerSpec(n_bits=self.act_bit, symmetric=self.a_sym,
                                   scale_method="max",
                                   leaf_param=self.quant_act),
            sm_abit=self.sm_abit)

    def policy_ldm(self) -> LDMQuantPolicy:
        """LDM/SD policy: 'mse' weights, 'mse'/'max' acts
        (sample_diffusion_ldm.py:456-462, txt2img.py:373-383)."""
        return LDMQuantPolicy(
            wq=AffineQuantizerSpec(n_bits=self.weight_bit, channel_wise=True,
                                   channel_axis=-1, scale_method="mse"),
            aq=AffineQuantizerSpec(
                n_bits=self.act_bit, symmetric=self.a_sym,
                scale_method="max" if self.a_min_max else "mse",
                leaf_param=self.quant_act),
            sm_abit=self.sm_abit)

    def calib_config(self) -> CalibConfig:
        return CalibConfig(
            weight=ReconConfig(iters=self.cali_iters,
                               batch_size=self.cali_batch_size, p=2.0),
            act=ReconConfig(iters=self.cali_iters_a,
                            batch_size=self.cali_batch_size,
                            lr=self.cali_lr, p=self.cali_p),
            quant_act=self.quant_act, running_stat=self.running_stat,
            rs_sm_only=self.rs_sm_only, sm_abit=self.sm_abit,
            precompile=self.precompile, alpha_dtype=self.alpha_dtype,
            capture_group_bytes=self.capture_group_bytes,
            act_init_batch=self.act_init_batch)


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    name: str
    family: str  # 'pixel' | 'ldm' | 'sd'
    schedule: ScheduleConfig
    sampler: SamplerConfig
    image_size: int = 32
    channels: int = 3
    latent_size: int = 0
    latent_channels: int = 0
    scale_factor: float = 1.0
    unet_ddim: Optional[DDIMUNetConfig] = None
    unet_ldm: Optional[LDMUNetConfig] = None
    vae: Optional[VAEConfig] = None
    conditioning_key: Optional[str] = None
    clip: Optional["CLIPTextConfig"] = None  # text tower ('sd' family)
    # scale_by_std checkpoints (ddpm.py:460-493) carry the latent std in the
    # ckpt (scale_factor buffer); scale_factor above is then a placeholder
    # until load_fp_params reads it.
    scale_by_std: bool = False
    # full cond-stage description from YAML ingestion (config_yaml.py);
    # presets keep using `clip` directly.
    cond_stage: Optional[object] = None


# ---------------------------------------------------------------------------
# presets (reference model zoo)
# ---------------------------------------------------------------------------

CIFAR10 = TaskConfig(
    name="cifar10", family="pixel",
    schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 1000),
    sampler=SamplerConfig("generalized", 100, "quad", 0.0),
    image_size=32, channels=3,
    unet_ddim=DDIMUNetConfig(in_channels=3, out_ch=3, ch=128,
                             ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                             attn_resolutions=(16,), resolution=32))

LSUN_BEDS256 = TaskConfig(
    name="lsun_beds256", family="ldm",
    schedule=ScheduleConfig("ldm", "linear", 0.0015, 0.0195, 1000),
    sampler=SamplerConfig("ddim", 200, "uniform", 1.0),
    image_size=256, channels=3, latent_size=64, latent_channels=3,
    unet_ldm=LDMUNetConfig(image_size=64, in_channels=3, out_channels=3,
                           model_channels=224,
                           attention_resolutions=(8, 4, 2),
                           num_res_blocks=2, channel_mult=(1, 2, 3, 4),
                           num_head_channels=32),
    vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4), num_res_blocks=2,
                  attn_resolutions=(), in_channels=3, resolution=256,
                  z_channels=3, double_z=False, embed_dim=3, n_embed=8192))

LSUN_CHURCHES256 = TaskConfig(
    name="lsun_churches256", family="ldm",
    schedule=ScheduleConfig("ldm", "linear", 0.0015, 0.0155, 1000),
    sampler=SamplerConfig("ddim", 400, "uniform", 0.0),
    image_size=256, channels=3, latent_size=32, latent_channels=4,
    scale_factor=0.18215,  # scale_by_std checkpoint value
    unet_ldm=LDMUNetConfig(image_size=32, in_channels=4, out_channels=4,
                           model_channels=192,
                           attention_resolutions=(1, 2, 4, 8),
                           num_res_blocks=2, channel_mult=(1, 2, 2, 4, 4),
                           num_heads=8, use_scale_shift_norm=True,
                           resblock_updown=True),
    vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                  attn_resolutions=(), in_channels=3, resolution=256,
                  z_channels=4, double_z=True, embed_dim=4))

SD_V1 = TaskConfig(
    name="sd_v1", family="sd",
    schedule=ScheduleConfig("ldm", "linear", 0.00085, 0.012, 1000),
    sampler=SamplerConfig("plms", 50, "uniform", 0.0, guidance_scale=7.5),
    image_size=512, channels=3, latent_size=64, latent_channels=4,
    scale_factor=0.18215, conditioning_key="crossattn",
    unet_ldm=LDMUNetConfig(image_size=32, in_channels=4, out_channels=4,
                           model_channels=320,
                           attention_resolutions=(4, 2, 1),
                           num_res_blocks=2, channel_mult=(1, 2, 4, 4),
                           num_heads=8, use_spatial_transformer=True,
                           transformer_depth=1, context_dim=768,
                           legacy=False),
    vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                  attn_resolutions=(), in_channels=3, resolution=256,
                  z_channels=4, double_z=True, embed_dim=4),
    clip=CLIPTextConfig())

PRESETS = {c.name: c for c in (CIFAR10, LSUN_BEDS256, LSUN_CHURCHES256, SD_V1)}
