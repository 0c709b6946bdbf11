"""Reference YAML config ingestion.

The reference instantiates its entire model zoo from OmegaConf
`target/params` trees (ldm/util.py:81-96 `instantiate_from_config`:
`get_obj_from_str(config["target"])(**config.get("params", {}))`), fed by
`configs/latent-diffusion/*.yaml`, `configs/stable-diffusion/*.yaml` and
`models/ldm/*/config.yaml`; the CIFAR lineage uses a flat namespace yml
(`configs/cifar10.yml`, ddim/main.py:dict2namespace). A user arriving with
a real checkpoint carries one of these files — this module maps any of
them onto the native dataclass configs (config.py) WITHOUT importing
torch classes: each known `target` class name is translated to the
equivalent native model config.

Coverage (every target appearing under /root/reference/configs and
/root/reference/models/ldm/*/config.yaml):
  * ldm.models.diffusion.ddpm.LatentDiffusion / LatentInpaintDiffusion
    — schedule + latent geometry + conditioning_key resolution
    (ddpm.py:436-453: explicit key, else 'concat' if concat_mode else
    'crossattn', forced None for `__is_unconditional__`).
  * ldm.modules.diffusionmodules.openaimodel.UNetModel -> LDMUNetConfig
    (use_checkpoint is ignored: inference-only, rematerialisation is a
    jit-time choice here, not a model property).
  * ldm.models.autoencoder.AutoencoderKL / VQModelInterface -> VAEConfig
    (ddconfig + embed_dim [+ n_embed]); ckpt_path/lossconfig ignored.
  * cond stages (ldm/modules/encoders/modules.py): FrozenCLIPEmbedder,
    BERTEmbedder, ClassEmbedder, SpatialRescaler, torch.nn.Identity,
    `__is_unconditional__`, `__is_first_stage__` -> CondStageConfig.
Unknown targets raise with the offending path so silent misloads are
impossible.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

from qdiffusion_tpu.config import (
    SamplerConfig,
    ScheduleConfig,
    TaskConfig,
)
from qdiffusion_tpu.models.bert_text import BERTTextConfig
from qdiffusion_tpu.models.clip_text import CLIPTextConfig
from qdiffusion_tpu.models.unet_ddim import DDIMUNetConfig
from qdiffusion_tpu.models.unet_ldm import LDMUNetConfig
from qdiffusion_tpu.models.vae import VAEConfig


def _tup(v) -> Tuple[int, ...]:
    if v is None:
        return ()
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return (v,)


def _target_name(cfg) -> str:
    if not isinstance(cfg, dict) or "target" not in cfg:
        raise ValueError(f"expected a target/params node, got {cfg!r}")
    return cfg["target"].rsplit(".", 1)[-1]


def _params(cfg) -> dict:
    return dict(cfg.get("params") or {})


# --------------------------------------------------------------------- unet


def _load_unet(cfg) -> LDMUNetConfig:
    name = _target_name(cfg)
    if name != "UNetModel":
        raise ValueError(f"unsupported unet target {cfg['target']!r}")
    p = _params(cfg)
    known = dict(
        image_size=p.pop("image_size", 32),
        in_channels=p.pop("in_channels", 4),
        model_channels=p.pop("model_channels", 320),
        out_channels=p.pop("out_channels", 4),
        num_res_blocks=p.pop("num_res_blocks", 2),
        attention_resolutions=_tup(p.pop("attention_resolutions", (4, 2, 1))),
        channel_mult=_tup(p.pop("channel_mult", (1, 2, 4, 4))),
        conv_resample=p.pop("conv_resample", True),
        num_heads=p.pop("num_heads", -1),
        num_head_channels=p.pop("num_head_channels", -1),
        num_heads_upsample=p.pop("num_heads_upsample", -1),
        use_scale_shift_norm=p.pop("use_scale_shift_norm", False),
        resblock_updown=p.pop("resblock_updown", False),
        use_spatial_transformer=p.pop("use_spatial_transformer", False),
        transformer_depth=p.pop("transformer_depth", 1),
        context_dim=p.pop("context_dim", None),
        legacy=p.pop("legacy", True),
        num_classes=p.pop("num_classes", None),
    )
    p.pop("use_checkpoint", None)  # training-era remat flag, inference n/a
    p.pop("dropout", None)  # inference-only
    if p:
        raise ValueError(f"unmapped UNetModel params: {sorted(p)}")
    return LDMUNetConfig(**known)


# ---------------------------------------------------------------- first stage


def _load_first_stage(cfg) -> Optional[VAEConfig]:
    if cfg in (None, "__is_first_stage__"):
        return None
    name = _target_name(cfg)
    if name == "IdentityFirstStage":
        return None
    if name not in ("AutoencoderKL", "VQModel", "VQModelInterface"):
        raise ValueError(f"unsupported first stage {cfg['target']!r}")
    p = _params(cfg)
    dd = p.get("ddconfig") or {}
    return VAEConfig(
        ch=dd.get("ch", 128),
        out_ch=dd.get("out_ch", 3),
        ch_mult=_tup(dd.get("ch_mult", (1, 2, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=_tup(dd.get("attn_resolutions", ())),
        in_channels=dd.get("in_channels", 3),
        resolution=dd.get("resolution", 256),
        z_channels=dd.get("z_channels", 3),
        double_z=dd.get("double_z", name == "AutoencoderKL"),
        embed_dim=p.get("embed_dim", dd.get("z_channels", 3)),
        n_embed=p.get("n_embed") if name.startswith("VQ") else None,
    )


# ----------------------------------------------------------------- cond stage


@dataclasses.dataclass(frozen=True)
class CondStageConfig:
    """Native translation of the reference cond_stage_config zoo
    (ldm/modules/encoders/modules.py)."""

    kind: str  # clip | bert | class | spatial_rescaler | identity | first_stage
    clip: Optional[CLIPTextConfig] = None
    bert: Optional[BERTTextConfig] = None
    bert_use_tokenizer: bool = True
    n_classes: int = 1000  # ClassEmbedder default (modules.py:35)
    embed_dim: int = 512
    cond_key: str = "class_label"
    n_stages: int = 1  # SpatialRescaler (modules.py:104-133)
    rescale_multiplier: float = 0.5
    rescale_method: str = "bilinear"
    rescale_in_channels: Optional[int] = None
    rescale_out_channels: Optional[int] = None


def _load_cond_stage(cfg) -> Optional[CondStageConfig]:
    if cfg in (None, "__is_unconditional__"):
        return None
    if cfg == "__is_first_stage__":
        return CondStageConfig(kind="first_stage")
    name = _target_name(cfg)
    p = _params(cfg)
    if name == "Identity":
        return CondStageConfig(kind="identity")
    if name == "FrozenCLIPEmbedder":
        # version/device/max_length: HF ViT-L/14 defaults (modules.py:137)
        return CondStageConfig(
            kind="clip",
            clip=CLIPTextConfig(max_positions=p.get("max_length", 77)))
    if name == "BERTEmbedder":
        return CondStageConfig(
            kind="bert",
            bert=BERTTextConfig(
                n_embed=p.get("n_embed", 1280),
                n_layer=p.get("n_layer", 32),
                vocab_size=p.get("vocab_size", 30522),
                max_seq_len=p.get("max_seq_len", 77)),
            bert_use_tokenizer=p.get("use_tokenizer", True))
    if name == "ClassEmbedder":
        return CondStageConfig(
            kind="class", n_classes=p.get("n_classes", 1000),
            embed_dim=p.get("embed_dim", 512),
            cond_key=p.get("key", "class_label"))
    if name == "SpatialRescaler":
        return CondStageConfig(
            kind="spatial_rescaler",
            n_stages=p.get("n_stages", 1),
            rescale_multiplier=p.get("multiplier", 0.5),
            rescale_method=p.get("method", "bilinear"),
            rescale_in_channels=p.get("in_channels"),
            rescale_out_channels=p.get("out_channels"))
    raise ValueError(f"unsupported cond stage {cfg['target']!r}")


# -------------------------------------------------------------------- loaders


def _load_latent_diffusion(name: str, model_cfg: dict) -> TaskConfig:
    p = _params(model_cfg)
    target = _target_name(model_cfg)

    schedule = ScheduleConfig(
        kind="ldm",
        beta_schedule=p.get("beta_schedule", "linear"),
        beta_start=p.get("linear_start", 1e-4),
        beta_end=p.get("linear_end", 2e-2),
        num_timesteps=p.get("timesteps", 1000))

    unet = _load_unet(p["unet_config"])
    vae = _load_first_stage(p.get("first_stage_config"))
    cond = _load_cond_stage(p.get("cond_stage_config"))

    # conditioning_key resolution, ddpm.py:436-453 (LatentInpaintDiffusion
    # passes its explicit key through the same path)
    ck = p.get("conditioning_key")
    if ck is None:
        ck = "concat" if p.get("concat_mode", True) else "crossattn"
    if p.get("cond_stage_config") in (None, "__is_unconditional__"):
        ck = None

    latent_size = p.get("image_size", unet.image_size)
    latent_channels = p.get("channels", unet.out_channels)
    image_size = vae.resolution if vae is not None else latent_size

    family = "sd" if (cond is not None and cond.kind == "clip") else "ldm"
    is_txt2img = cond is not None and cond.kind in ("clip", "bert")
    sampler = SamplerConfig(
        sample_type="plms" if family == "sd" else "ddim",
        timesteps=50 if family == "sd" else 200,
        skip_type="uniform", eta=0.0,
        guidance_scale=7.5 if is_txt2img else 1.0)

    _ = target  # LatentDiffusion vs LatentInpaintDiffusion: same mapping
    return TaskConfig(
        name=name, family=family, schedule=schedule, sampler=sampler,
        image_size=image_size, channels=3,
        latent_size=latent_size, latent_channels=latent_channels,
        scale_factor=p.get("scale_factor", 1.0),
        scale_by_std=p.get("scale_by_std", False),
        unet_ldm=unet, vae=vae, conditioning_key=ck,
        clip=cond.clip if cond is not None and cond.kind == "clip" else None,
        cond_stage=cond)


def _load_ddim_style(name: str, cfg: dict) -> TaskConfig:
    """Flat CIFAR-style yml (configs/cifar10.yml, ddim/main.py namespace)."""
    m, d = cfg["model"], cfg["diffusion"]
    data = cfg.get("data", {})
    image_size = data.get("image_size", 32)
    unet = DDIMUNetConfig(
        in_channels=m.get("in_channels", 3),
        out_ch=m.get("out_ch", 3),
        ch=m.get("ch", 128),
        ch_mult=_tup(m.get("ch_mult", (1, 2, 2, 2))),
        num_res_blocks=m.get("num_res_blocks", 2),
        attn_resolutions=_tup(m.get("attn_resolutions", (16,))),
        resolution=image_size,
        resamp_with_conv=m.get("resamp_with_conv", True))
    schedule = ScheduleConfig(
        kind="ddpm",
        beta_schedule=d.get("beta_schedule", "linear"),
        beta_start=d.get("beta_start", 1e-4),
        beta_end=d.get("beta_end", 2e-2),
        num_timesteps=d.get("num_diffusion_timesteps", 1000))
    return TaskConfig(
        name=name, family="pixel", schedule=schedule,
        sampler=SamplerConfig("generalized", 100, "quad", 0.0),
        image_size=image_size, channels=data.get("channels", 3),
        unet_ddim=unet)


def load_task_config(path, name: Optional[str] = None) -> TaskConfig:
    """Parse a reference YAML (either zoo format) into a TaskConfig."""
    import yaml

    path = Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"{path}: not a mapping")
    name = name or path.stem
    if "model" not in cfg:
        raise ValueError(f"{path}: no 'model' section")
    model_cfg = cfg["model"]
    if isinstance(model_cfg, dict) and "target" in model_cfg:
        tgt = _target_name(model_cfg)
        if tgt in ("LatentDiffusion", "LatentInpaintDiffusion", "DDPM"):
            return _load_latent_diffusion(name, model_cfg)
        raise ValueError(f"{path}: unsupported model target "
                         f"{model_cfg['target']!r}")
    if isinstance(model_cfg, dict) and model_cfg.get("type") == "simple":
        return _load_ddim_style(name, cfg)
    raise ValueError(f"{path}: unrecognized config format")


def build_cond_stage(cond: CondStageConfig):
    """Construct the native encoder object for a CondStageConfig; returns
    None for identity/first-stage kinds (handled by the pipeline)."""
    if cond.kind == "clip":
        from qdiffusion_tpu.models.clip_text import CLIPTextEncoder
        return CLIPTextEncoder(cond.clip or CLIPTextConfig())
    if cond.kind == "bert":
        from qdiffusion_tpu.models.bert_text import BERTTextEncoder
        return BERTTextEncoder(cond.bert or BERTTextConfig())
    return None
