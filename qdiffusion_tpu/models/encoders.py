"""Conditioning encoders beyond the text towers.

Functional equivalents of the small members of the reference encoder
family (ldm/modules/encoders/modules.py):

  * ClassEmbedder (:34-50) — class-label -> embedding lookup, the `adm`
    conditioning of class-conditional LDMs (cin256).
  * SpatialRescaler (:104-133) — n-stage spatial resize (+ optional 1x1
    channel remap), the semantic-synthesis conditioning path.
  * IdentityFirstStage — pass-through first stage (autoencoder.py:426+).

The CLIP text tower is models/clip_text.py; the BERT tower is
models/bert_text.py. FrozenCLIPTextEmbedder / FrozenClipImageEmbedder wrap
the same CLIP weights with pooled outputs — their encode paths are the
text/image towers plus a projection; the image tower is out of the PTQ flow
(no reference model uses it) and is not re-implemented.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn

Array = jnp.ndarray


def class_embedder(params: dict, labels: Array) -> Array:
    """labels (B,) int -> (B, 1, D) embeddings (ClassEmbedder with the
    default key; the trailing token axis matches crossattn usage)."""
    emb = params["embedding"]["weight"][labels]
    return emb[:, None, :]


def spatial_rescaler(x: Array, *, n_stages: int = 1, multiplier: float = 0.5,
                     method: str = "bilinear",
                     channel_mapper: Optional[dict] = None) -> Array:
    """NHWC n-stage resize; optional 1x1 remap."""
    for _ in range(n_stages):
        n, h, w, c = x.shape
        new = (int(h * multiplier), int(w * multiplier))
        x = jax.image.resize(x, (n, *new, c), method=method)
    if channel_mapper is not None:
        x = nn.conv2d(x, channel_mapper["w"], channel_mapper.get("b"),
                      padding="VALID")
    return x


def identity_first_stage(x: Array) -> Array:
    return x
