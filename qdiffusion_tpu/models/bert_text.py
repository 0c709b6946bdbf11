"""BERT-style text encoder for the LAION-400M text2img LDM.

Functional equivalent of the reference BERTEmbedder
(ldm/modules/encoders/modules.py:80-103): a lucidrains-style
TransformerWrapper + Encoder (ldm/modules/x_transformer.py) in its default
configuration — token + learned absolute position embeddings, pre-LayerNorm
[attention, feed-forward] blocks (heads=8, dim_head=64, bias-free q/k/v,
GELU FF at mult 4), final LayerNorm, embeddings returned (no logits head).

Tokenization (HF bert-base-uncased, vocab 30522) is external, as in the
reference; apply() takes token ids.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BERTTextConfig:
    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    heads: int = 8
    dim_head: int = 64


class BERTTextEncoder:
    def __init__(self, config: BERTTextConfig = BERTTextConfig()):
        self.cfg = config

    def apply(self, params: dict, input_ids: Array) -> Array:
        cfg = self.cfg
        p = params["transformer"]
        B, L = input_ids.shape
        x = p["token_emb"]["weight"][input_ids]
        x = x + p["pos_emb"]["emb"]["weight"][None, :L, :]

        layers = p["attn_layers"]["layers"]
        for i in range(2 * cfg.n_layer):
            blk = layers[str(i)]
            h = nn.layer_norm(x, blk["0"]["scale"], blk["0"]["bias"])
            if i % 2 == 0:
                x = x + self._attention(blk["1"], h)
            else:
                ff = nn.dense(h, blk["1"]["net"]["0"]["0"]["w"],
                              blk["1"]["net"]["0"]["0"]["b"])
                ff = nn.gelu(ff)
                x = x + nn.dense(ff, blk["1"]["net"]["2"]["w"],
                                 blk["1"]["net"]["2"]["b"])
        return nn.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])

    def _attention(self, p: dict, h: Array) -> Array:
        cfg = self.cfg
        B, L, D = h.shape
        nh, dh = cfg.heads, cfg.dim_head
        q = nn.dense(h, p["to_q"]["w"]).reshape(B, L, nh, dh)
        k = nn.dense(h, p["to_k"]["w"]).reshape(B, L, nh, dh)
        v = nn.dense(h, p["to_v"]["w"]).reshape(B, L, nh, dh)
        w = jnp.einsum("bihd,bjhd->bhij", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        w = jax.nn.softmax(w, axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", w, v,
                       preferred_element_type=jnp.float32).astype(h.dtype)
        return nn.dense(o.reshape(B, L, nh * dh), p["to_out"]["w"],
                        p["to_out"]["b"])
