"""Stable Diffusion safety checker: CLIP-cosine concept screening.

The reference loads diffusers' ``StableDiffusionSafetyChecker``
(scripts/txt2img.py:29-37) and defines ``check_safety`` (:96-102), though
the call site itself is commented out (:558-559). The checker's weights
("CompVis/stable-diffusion-safety-checker") are an external artifact in
this zero-egress environment, so — like the CLIP towers — the
architecture is implemented natively and published weights convert
directly via :func:`convert_safety_checker`.

Architecture (diffusers safety_checker.py semantics): a CLIP ViT-L/14
vision tower's pooled class-token embedding goes through a bias-free
visual projection to 768-d; cosine similarities against 17 learned
"concept" embeddings and 3 "special care" embeddings are compared with
per-concept thresholds; any special-care hit lowers every concept
threshold by 0.01; images with any concept score above threshold are
replaced with black. (diffusers' numpy scoring path rounds scores to 3
decimals before comparing; its traced-tensor path — which this follows —
does not.)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu.models.clip_vision import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    convert_hf_clip_vision,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SafetyCheckerConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    projection_dim: int = 768


def _normalize(x: Array) -> Array:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class SafetyChecker:
    """Functional safety checker over the native CLIP vision tower."""

    def __init__(self, config: SafetyCheckerConfig = SafetyCheckerConfig()):
        self.cfg = config
        self.vision = CLIPVisionEncoder(config.vision)

    def preprocess(self, images01: Array) -> Array:
        """[0,1] NHWC sampler output -> CLIP pixel_values.

        The reference feeds ``x_samples_ddim`` ([0,1] numpy) through
        AutoFeatureExtractor (resize 224 + CLIP mean/std normalize);
        resize here is bilinear ``jax.image`` like
        CLIPVisionEncoder.preprocess.
        """
        import jax

        n, h, w, c = images01.shape
        s = self.cfg.vision.image_size
        if (h, w) != (s, s):
            images01 = jax.image.resize(images01, (n, s, s, c),
                                        method="bilinear")
        return (images01 - CLIP_MEAN) / CLIP_STD

    def scores(self, params: dict, pixel_values: Array):
        """(concept_scores (B, n_concepts), special_scores (B, n_special)).

        score > 0 means the image exceeds that concept's threshold.
        """
        pooled = self.vision.apply(params["vision"], pixel_values)
        embeds = pooled @ params["visual_projection"]["w"]
        embeds = _normalize(embeds)
        special_cos = embeds @ _normalize(params["special_care_embeds"]).T
        cos = embeds @ _normalize(params["concept_embeds"]).T
        special_scores = special_cos - params["special_care_embeds_weights"]
        adjustment = 0.01 * jnp.any(special_scores > 0, axis=-1,
                                    keepdims=True)
        concept_scores = cos - params["concept_embeds_weights"] + adjustment
        return concept_scores, special_scores

    def apply(self, params: dict, images01: Array):
        """(checked_images, has_nsfw (B,) bool) — flagged images blacked
        out, exactly the diffusers contract the reference's check_safety
        returns (txt2img.py:96-102)."""
        concept_scores, _ = self.scores(params,
                                        self.preprocess(images01))
        has_nsfw = jnp.any(concept_scores > 0, axis=-1)
        checked = jnp.where(has_nsfw[:, None, None, None],
                            jnp.zeros_like(images01), images01)
        return checked, has_nsfw


def config_from_sd(sd: dict, num_heads: int | None = None
                   ) -> SafetyCheckerConfig:
    """Infer the checker's CLIP config from a diffusers state_dict.

    Head count is not recoverable from tensor shapes; CLIP uses 64-d
    heads (ViT-L: 1024/16), so default to hidden//64 unless overridden.
    """

    def _shape(key):
        v = sd[key]
        return tuple(v.shape)

    pre = "vision_model.vision_model."
    hidden, _, patch, _ = _shape(pre + "embeddings.patch_embedding.weight")
    n_pos = _shape(pre + "embeddings.position_embedding.weight")[0]
    image_size = patch * int(round((n_pos - 1) ** 0.5))
    intermediate = _shape(pre + "encoder.layers.0.mlp.fc1.weight")[0]
    layers = 1 + max(int(k.split("encoder.layers.")[1].split(".")[0])
                     for k in sd if "encoder.layers." in k)
    proj_dim = _shape("visual_projection.weight")[0]
    if num_heads is None:
        if hidden % 64:
            raise ValueError(
                f"cannot infer num_heads for hidden_size {hidden}; pass "
                "num_heads explicitly")
        num_heads = hidden // 64
    return SafetyCheckerConfig(
        vision=CLIPVisionConfig(image_size=image_size, patch_size=patch,
                                hidden_size=hidden,
                                intermediate_size=intermediate,
                                num_layers=layers, num_heads=num_heads),
        projection_dim=proj_dim)


def convert_safety_checker(sd: dict) -> dict:
    """diffusers StableDiffusionSafetyChecker state_dict -> param tree.

    Expected keys: ``vision_model.vision_model.*`` (HF CLIPVisionModel),
    ``visual_projection.weight`` and the four concept buffers.
    """

    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)

    vision_sd = {k[len("vision_model."):]: v for k, v in sd.items()
                 if k.startswith("vision_model.")}
    return {
        "vision": convert_hf_clip_vision(vision_sd),
        # torch Linear stores (out, in); dense layout is (in, out)
        "visual_projection": {
            "w": np.transpose(_np(sd["visual_projection.weight"]))},
        "concept_embeds": _np(sd["concept_embeds"]).astype(np.float32),
        "special_care_embeds":
            _np(sd["special_care_embeds"]).astype(np.float32),
        "concept_embeds_weights":
            _np(sd["concept_embeds_weights"]).astype(np.float32),
        "special_care_embeds_weights":
            _np(sd["special_care_embeds_weights"]).astype(np.float32),
    }
