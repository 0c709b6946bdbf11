"""Reference YAML config ingestion (config_yaml.py).

Every config shipped by the reference (`configs/**.yaml|yml` and
`models/ldm/*/config.yaml`) must parse into a buildable TaskConfig —
this is the path a user with a real checkpoint + its config.yaml takes
(reference: ldm/util.py:81-96 instantiate_from_config)."""

import dataclasses
import glob
import os

import pytest

from qdiffusion_tpu.config import CIFAR10, LSUN_BEDS256, SD_V1
from qdiffusion_tpu.config_yaml import build_cond_stage, load_task_config

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _all_ldm_yamls():
    return sorted(
        glob.glob(f"{REF}/configs/latent-diffusion/*.yaml")
        + glob.glob(f"{REF}/configs/stable-diffusion/*.yaml")
        + glob.glob(f"{REF}/configs/retrieval-augmented-diffusion/*.yaml")
        + glob.glob(f"{REF}/models/ldm/*/config.yaml"))


def test_finds_reference_configs():
    assert len(_all_ldm_yamls()) >= 20


@pytest.mark.parametrize("path", _all_ldm_yamls(),
                         ids=lambda p: p.replace(REF + "/", ""))
def test_every_ldm_config_builds(path):
    from qdiffusion_tpu.cli import build_model_and_pipeline

    task = load_task_config(path)
    assert task.family in ("ldm", "sd")
    assert task.unet_ldm is not None
    assert task.schedule.kind == "ldm"
    # model + pipeline construction wires the quant-site registry from the
    # config (no parameter allocation) — the structural "buildable" check
    model, pipe = build_model_and_pipeline(task)
    assert model.cfg == task.unet_ldm
    if task.cond_stage is not None:
        build_cond_stage(task.cond_stage)  # clip/bert towers constructible


def test_sd_v1_inference_matches_preset():
    task = load_task_config(f"{REF}/configs/stable-diffusion/v1-inference.yaml")
    assert task.unet_ldm == SD_V1.unet_ldm
    assert task.vae == SD_V1.vae
    assert task.family == "sd"
    assert task.conditioning_key == "crossattn"
    assert task.scale_factor == pytest.approx(0.18215)
    assert task.schedule.beta_start == pytest.approx(0.00085)
    assert task.schedule.beta_end == pytest.approx(0.012)
    assert task.clip is not None and task.clip.hidden_size == 768


def test_lsun_beds_matches_preset():
    task = load_task_config(f"{REF}/models/ldm/lsun_beds256/config.yaml")
    assert task.unet_ldm == LSUN_BEDS256.unet_ldm
    assert task.vae == LSUN_BEDS256.vae
    assert task.conditioning_key is None
    assert task.latent_size == 64 and task.latent_channels == 3
    assert task.image_size == 256


def test_lsun_churches_scale_by_std():
    task = load_task_config(f"{REF}/models/ldm/lsun_churches256/config.yaml")
    assert task.scale_by_std is True
    # placeholder until the ckpt's scale_factor buffer is read
    assert task.scale_factor == pytest.approx(1.0)
    assert task.vae.double_z is True and task.vae.n_embed is None


def test_class_conditional_cin():
    task = load_task_config(f"{REF}/models/ldm/cin256/config.yaml")
    cs = task.cond_stage
    assert cs is not None and cs.kind == "class"
    assert cs.embed_dim == 512 and cs.cond_key == "class_label"
    assert task.conditioning_key == "crossattn"


def test_bert_text2img():
    task = load_task_config(f"{REF}/models/ldm/text2img256/config.yaml")
    cs = task.cond_stage
    assert cs.kind == "bert"
    assert cs.bert.n_embed == 640 and cs.bert.n_layer == 32
    enc = build_cond_stage(cs)
    assert enc is not None


def test_spatial_rescaler_semantic_synthesis():
    task = load_task_config(
        f"{REF}/models/ldm/semantic_synthesis256/config.yaml")
    cs = task.cond_stage
    assert cs.kind == "spatial_rescaler"
    assert cs.n_stages == 2
    assert cs.rescale_in_channels == 182 and cs.rescale_out_channels == 3
    assert task.conditioning_key == "concat"


def test_inpainting_hybrid():
    task = load_task_config(
        f"{REF}/configs/stable-diffusion/v1-inpainting-inference.yaml")
    assert task.conditioning_key == "hybrid"
    assert task.unet_ldm.in_channels == 9  # latent 4 + mask 1 + masked 4
    assert task.cond_stage.kind == "clip"


def test_cifar10_yml_matches_preset():
    task = load_task_config(f"{REF}/configs/cifar10.yml", name="cifar10")
    assert task.family == "pixel"
    assert task.unet_ddim == dataclasses.replace(CIFAR10.unet_ddim)
    assert task.schedule == CIFAR10.schedule


def test_unknown_target_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  target: foo.bar.Baz\n  params: {}\n")
    with pytest.raises(ValueError, match="unsupported model target"):
        load_task_config(p)


def test_unmapped_unet_param_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(
        "model:\n"
        "  target: ldm.models.diffusion.ddpm.LatentDiffusion\n"
        "  params:\n"
        "    unet_config:\n"
        "      target: ldm.modules.diffusionmodules.openaimodel.UNetModel\n"
        "      params: {frobnicate: 3}\n")
    with pytest.raises(ValueError, match="unmapped UNetModel params"):
        load_task_config(p)


def test_cli_config_flag(tmp_path):
    """`sample --config <yaml>` resolves through the loader."""
    import argparse

    from qdiffusion_tpu.cli import resolve_task

    ns = argparse.Namespace(
        task=None, config=f"{REF}/models/ldm/lsun_beds256/config.yaml")
    task = resolve_task(ns)
    assert task.name == "config"  # file stem
    ns2 = argparse.Namespace(task="beds", config=ns.config)
    assert resolve_task(ns2).name == "beds"
