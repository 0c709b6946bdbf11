"""CLIP vision tower (ViT image encoder) for image-conditioned models.

Functional equivalent of the encoder wrapped by the reference
FrozenClipImageEmbedder (ldm/modules/encoders/modules.py:196-229): patchify
conv, class token + position embeddings, pre-LN transformer (quick-GELU),
pooled (class-token) output through the final LayerNorm and optional
projection — matching HF CLIPVisionModel semantics so published CLIP
weights convert directly.

Includes the reference's preprocessing contract: [-1,1] inputs -> resize to
224 -> CLIP mean/std normalization (modules.py:211-218; resize here is
bilinear jax.image, the reference uses kornia bicubic — swap the resized
array in if exact bicubic parity is needed).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu import nn
from qdiffusion_tpu.models.clip_text import quick_gelu

Array = jnp.ndarray

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5


class CLIPVisionEncoder:
    def __init__(self, config: CLIPVisionConfig = CLIPVisionConfig()):
        self.cfg = config

    def preprocess(self, x: Array) -> Array:
        """[-1,1] NHWC images -> normalized 224x224 (reference
        FrozenClipImageEmbedder.preprocess)."""
        n, h, w, c = x.shape
        s = self.cfg.image_size
        if (h, w) != (s, s):
            x = jax.image.resize(x, (n, s, s, c), method="bilinear")
        x = (x + 1.0) / 2.0
        return (x - CLIP_MEAN) / CLIP_STD

    def apply(self, params: dict, pixel_values: Array,
              pooled: bool = True) -> Array:
        """pixel_values: normalized NHWC. Returns pooled (B, D) class-token
        embedding (post final LayerNorm) or the full (B, 1+P, D) states."""
        cfg = self.cfg
        B = pixel_values.shape[0]
        # patchify: conv stride=patch, no bias (HF patch_embedding)
        h = nn.conv2d(pixel_values, params["patch_embedding"]["w"],
                      None, stride=cfg.patch_size, padding="VALID")
        P = (cfg.image_size // cfg.patch_size) ** 2
        h = h.reshape(B, P, cfg.hidden_size)
        cls = jnp.broadcast_to(params["class_embedding"],
                               (B, 1, cfg.hidden_size))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + params["position_embedding"]["weight"][None]
        h = nn.layer_norm(h, params["pre_layrnorm"]["scale"],
                          params["pre_layrnorm"]["bias"],
                          eps=cfg.layer_norm_eps)

        for i in range(cfg.num_layers):
            p = params["layers"][str(i)]
            h = h + self._attention(p["self_attn"], nn.layer_norm(
                h, p["layer_norm1"]["scale"], p["layer_norm1"]["bias"],
                eps=cfg.layer_norm_eps))
            hm = nn.layer_norm(h, p["layer_norm2"]["scale"],
                               p["layer_norm2"]["bias"],
                               eps=cfg.layer_norm_eps)
            hm = nn.dense(hm, p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"])
            hm = quick_gelu(hm)
            h = h + nn.dense(hm, p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"])

        if not pooled:
            return h
        cls_out = h[:, 0]
        return nn.layer_norm(cls_out, params["post_layernorm"]["scale"],
                             params["post_layernorm"]["bias"],
                             eps=cfg.layer_norm_eps)

    def _attention(self, p: dict, h: Array) -> Array:
        cfg = self.cfg
        B, L, D = h.shape
        nh = cfg.num_heads
        dh = D // nh
        q = nn.dense(h, p["q_proj"]["w"], p["q_proj"]["b"]).reshape(B, L, nh, dh)
        k = nn.dense(h, p["k_proj"]["w"], p["k_proj"]["b"]).reshape(B, L, nh, dh)
        v = nn.dense(h, p["v_proj"]["w"], p["v_proj"]["b"]).reshape(B, L, nh, dh)
        w = jnp.einsum("bihd,bjhd->bhij", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        w = jax.nn.softmax(w, axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", w, v,
                       preferred_element_type=jnp.float32).astype(h.dtype)
        return nn.dense(o.reshape(B, L, D), p["out_proj"]["w"],
                        p["out_proj"]["b"])


def convert_hf_clip_vision(sd: dict) -> dict:
    """HF CLIPVisionModel state_dict -> our param tree."""
    from qdiffusion_tpu.models.torch_import import state_dict_to_pytree

    clean = {}
    for k, v in sd.items():
        if k.startswith("vision_model."):
            k = k[len("vision_model."):]
        k = (k.replace("embeddings.patch_embedding", "patch_embedding")
              .replace("embeddings.position_embedding", "position_embedding")
              .replace("embeddings.class_embedding", "class_embedding")
              .replace("encoder.layers", "layers"))
        if "position_ids" in k:
            continue
        clean[k] = v
    tree = state_dict_to_pytree(clean)
    tree["position_embedding"] = {
        "weight": np.transpose(tree["position_embedding"]["w"])}
    if isinstance(tree.get("class_embedding"), dict):
        tree["class_embedding"] = next(iter(tree["class_embedding"].values()))
    return tree
