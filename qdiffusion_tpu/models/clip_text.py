"""CLIP text encoder (ViT-L/14 text tower) for Stable Diffusion conditioning.

Functional JAX re-implementation of the HF CLIPTextModel used by the
reference FrozenCLIPEmbedder (ldm/modules/encoders/modules.py:137-162):
token + position embeddings, pre-LN transformer with causal masking and
quick-GELU MLPs, final LayerNorm; returns last_hidden_state (B, 77, 768)
— the (B, L, D) context consumed by SD cross-attention.

Weights convert from the HF state_dict (convert_hf_clip_text). Tokenization
is out of scope for the compute path: pass token ids (the reference uses
the HF CLIPTokenizer; any BPE implementation producing CLIP ids works).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu import nn

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    layer_norm_eps: float = 1e-5


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextEncoder:
    def __init__(self, config: CLIPTextConfig = CLIPTextConfig()):
        self.cfg = config

    def apply(self, params: dict, input_ids: Array) -> Array:
        """input_ids: (B, L) int32 -> last_hidden_state (B, L, D)."""
        cfg = self.cfg
        B, L = input_ids.shape
        tok = params["token_embedding"]["weight"]  # (V, D)
        pos = params["position_embedding"]["weight"]  # (P, D)
        h = tok[input_ids] + pos[None, :L, :]

        mask = jnp.where(
            jnp.tril(jnp.ones((L, L), jnp.bool_)), 0.0, -jnp.inf)

        for i in range(cfg.num_layers):
            p = params["layers"][str(i)]
            h = h + self._attention(p["self_attn"], nn.layer_norm(
                h, p["layer_norm1"]["scale"], p["layer_norm1"]["bias"],
                eps=cfg.layer_norm_eps), mask)
            hm = nn.layer_norm(h, p["layer_norm2"]["scale"],
                               p["layer_norm2"]["bias"],
                               eps=cfg.layer_norm_eps)
            hm = nn.dense(hm, p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"])
            hm = quick_gelu(hm)
            h = h + nn.dense(hm, p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"])

        return nn.layer_norm(h, params["final_layer_norm"]["scale"],
                             params["final_layer_norm"]["bias"],
                             eps=cfg.layer_norm_eps)

    def pooled_apply(self, params: dict, input_ids: Array,
                     normalize: bool = True) -> Array:
        """Pooled text features (FrozenCLIPTextEmbedder semantics,
        reference modules.py:163-190): the final-LN hidden state at each
        sequence's argmax token id (the EOS position in CLIP's BPE
        vocabulary), through the text projection when present, optionally
        L2-normalized."""
        h = self.apply(params, input_ids)  # (B, L, D), post final LN
        eos = jnp.argmax(input_ids, axis=-1)  # CLIP: eos has the max id
        pooled = h[jnp.arange(h.shape[0]), eos]
        proj = params.get("text_projection")
        if proj is not None:
            pooled = nn.dense(pooled, proj["w"])
        if normalize:
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled

    def _attention(self, p: dict, h: Array, mask: Array) -> Array:
        cfg = self.cfg
        B, L, D = h.shape
        nh = cfg.num_heads
        dh = D // nh
        q = nn.dense(h, p["q_proj"]["w"], p["q_proj"]["b"])
        k = nn.dense(h, p["k_proj"]["w"], p["k_proj"]["b"])
        v = nn.dense(h, p["v_proj"]["w"], p["v_proj"]["b"])
        q = q.reshape(B, L, nh, dh)
        k = k.reshape(B, L, nh, dh)
        v = v.reshape(B, L, nh, dh)
        w = jnp.einsum("bihd,bjhd->bhij", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        w = jax.nn.softmax(w + mask[None, None], axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", w, v,
                       preferred_element_type=jnp.float32).astype(h.dtype)
        o = o.reshape(B, L, D)
        return nn.dense(o, p["out_proj"]["w"], p["out_proj"]["b"])


def convert_hf_clip_text(sd: dict) -> dict:
    """HF CLIPTextModel state_dict -> our param tree."""
    from qdiffusion_tpu.models.torch_import import state_dict_to_pytree

    clean = {}
    prefix = "text_model."
    for k, v in sd.items():
        if k.startswith(prefix):
            k = k[len(prefix):]
        k = (k.replace("embeddings.token_embedding", "token_embedding")
              .replace("embeddings.position_embedding", "position_embedding")
              .replace("encoder.layers", "layers"))
        if "position_ids" in k:
            continue
        clean[k] = v
    tree = state_dict_to_pytree(clean)
    # embeddings: keep (V, D) matrices untransposed (state_dict_to_pytree
    # transposes every 2-D .weight; undo for lookup tables)
    for emb in ("token_embedding", "position_embedding"):
        tree[emb] = {"weight": np.transpose(tree[emb]["w"])}
    return tree
