"""Safety checker: tower+projection parity vs HF, head math vs a numpy
mirror of the diffusers scoring semantics (reference txt2img.py:29-37,
96-102)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.models.clip_vision import CLIPVisionConfig
from qdiffusion_tpu.models.safety import (
    SafetyChecker,
    SafetyCheckerConfig,
    convert_safety_checker,
)

TINY = SafetyCheckerConfig(
    vision=CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=4),
    projection_dim=16)


def _tiny_torch_checker():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    hf_cfg = HFConfig(image_size=32, patch_size=8, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, hidden_act="quick_gelu",
                      projection_dim=16)
    torch.manual_seed(0)
    vision = CLIPVisionModel(hf_cfg).eval()
    g = torch.Generator().manual_seed(1)
    proj = torch.randn(16, 32, generator=g) * 0.1
    concept_embeds = torch.randn(17, 16, generator=g)
    special_embeds = torch.randn(3, 16, generator=g)
    concept_w = torch.rand(17, generator=g) * 0.4
    special_w = torch.rand(3, generator=g) * 0.4
    sd = {f"vision_model.{k}": v for k, v in vision.state_dict().items()}
    sd.update({
        "visual_projection.weight": proj,
        "concept_embeds": concept_embeds,
        "special_care_embeds": special_embeds,
        "concept_embeds_weights": concept_w,
        "special_care_embeds_weights": special_w,
    })
    return vision, sd


def _ref_scores(vision, sd, px_nchw):
    """numpy/torch mirror of diffusers safety_checker.forward scoring."""
    import torch

    with torch.no_grad():
        pooled = vision(pixel_values=torch.from_numpy(px_nchw)).pooler_output
        embeds = pooled @ sd["visual_projection.weight"].T
        embeds = torch.nn.functional.normalize(embeds)
        special_cos = embeds @ torch.nn.functional.normalize(
            sd["special_care_embeds"]).T
        cos = embeds @ torch.nn.functional.normalize(sd["concept_embeds"]).T
        special_scores = special_cos - sd["special_care_embeds_weights"]
        adjustment = 0.01 * special_scores.gt(0).any(dim=-1, keepdim=True)
        concept_scores = cos - sd["concept_embeds_weights"] + adjustment
    return concept_scores.numpy(), special_scores.numpy()


def test_scores_parity_vs_torch_mirror():
    vision, sd = _tiny_torch_checker()
    rng = np.random.default_rng(0)
    px = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)

    ref_concept, ref_special = _ref_scores(vision, sd, px)

    checker = SafetyChecker(TINY)
    params = convert_safety_checker(sd)
    concept, special = checker.scores(
        params, jnp.asarray(np.transpose(px, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(special), ref_special,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(concept), ref_concept,
                               rtol=1e-3, atol=1e-5)


def test_special_care_adjustment_branch():
    """A special-care hit must lower every concept threshold by 0.01."""
    vision, sd = _tiny_torch_checker()
    checker = SafetyChecker(TINY)
    params = convert_safety_checker(sd)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    concept, special = checker.scores(params, px)
    # force the special branch by zeroing its thresholds (cos in [-1,1],
    # some coordinate is positive with these random embeds)
    params2 = dict(params, special_care_embeds_weights=np.full(3, -2.0,
                                                               np.float32))
    concept2, special2 = checker.scores(params2, px)
    assert bool(jnp.all(special2 > 0))
    np.testing.assert_allclose(np.asarray(concept2),
                               np.asarray(concept)
                               + 0.01 * (1.0 - np.asarray(
                                   jnp.any(special > 0, axis=-1,
                                           keepdims=True), np.float32)),
                               rtol=1e-5, atol=1e-6)


def test_apply_blacks_out_flagged():
    vision, sd = _tiny_torch_checker()
    checker = SafetyChecker(TINY)
    params = convert_safety_checker(sd)
    rng = np.random.default_rng(2)
    imgs = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)

    # thresholds at -2: every image flags; at +2: none do
    flag_all = dict(params, concept_embeds_weights=np.full(17, -2.0,
                                                           np.float32))
    checked, nsfw = checker.apply(flag_all, jnp.asarray(imgs))
    assert bool(jnp.all(nsfw))
    assert float(jnp.abs(checked).max()) == 0.0

    flag_none = dict(params, concept_embeds_weights=np.full(17, 2.0,
                                                            np.float32))
    checked, nsfw = checker.apply(flag_none, jnp.asarray(imgs))
    assert not bool(jnp.any(nsfw))
    np.testing.assert_allclose(np.asarray(checked), imgs, rtol=1e-6)


def test_config_inference_and_cli_flag(tmp_path, monkeypatch):
    """--safety-ckpt end to end: tiny torch state_dict -> inferred config
    -> every sampled image blacked out under an always-flag threshold."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    # 64-d heads so config_from_sd can infer num_heads (CLIP convention)
    hf_cfg = HFConfig(image_size=32, patch_size=8, hidden_size=128,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=2, hidden_act="quick_gelu")
    torch.manual_seed(0)
    vision = CLIPVisionModel(hf_cfg).eval()
    g = torch.Generator().manual_seed(1)
    sd = {f"vision_model.{k}": v for k, v in vision.state_dict().items()}
    sd.update({
        "visual_projection.weight": torch.randn(16, 128, generator=g),
        "concept_embeds": torch.randn(17, 16, generator=g),
        "special_care_embeds": torch.randn(3, 16, generator=g),
        "concept_embeds_weights": torch.full((17,), -2.0),  # always flag
        "special_care_embeds_weights": torch.full((3,), 2.0),
    })
    from qdiffusion_tpu.models.safety import config_from_sd

    cfg = config_from_sd(sd)
    assert cfg.vision.hidden_size == 128 and cfg.vision.num_heads == 2
    assert cfg.vision.num_layers == 2 and cfg.vision.image_size == 32
    assert cfg.projection_dim == 16

    ckpt = tmp_path / "safety.pt"
    torch.save(sd, ckpt)

    from qdiffusion_tpu import config as qconfig
    from qdiffusion_tpu import cli
    from qdiffusion_tpu.config import (SamplerConfig, ScheduleConfig,
                                       TaskConfig)
    from qdiffusion_tpu.models.unet_ddim import DDIMUNetConfig

    tiny = TaskConfig(
        name="tiny_safety", family="pixel",
        schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 100),
        sampler=SamplerConfig("generalized", 4, "uniform", 0.0),
        image_size=8, channels=3,
        unet_ddim=DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                 attn_resolutions=(), resolution=8))
    monkeypatch.setitem(qconfig.PRESETS, "tiny_safety", tiny)

    out = tmp_path / "samples"
    cli.main(["sample", "--task", "tiny_safety", "--n", "2", "--batch", "2",
              "--out", str(out), "--safety-ckpt", str(ckpt)])
    import PIL.Image

    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 2
    for p in pngs:
        assert np.asarray(PIL.Image.open(p)).max() == 0


def test_preprocess_resizes_and_normalizes():
    checker = SafetyChecker(TINY)
    out = checker.preprocess(jnp.full((1, 8, 8, 3), 0.5))
    assert out.shape == (1, 32, 32, 3)
    from qdiffusion_tpu.models.clip_vision import CLIP_MEAN, CLIP_STD

    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               (0.5 - CLIP_MEAN) / CLIP_STD, rtol=1e-5)
