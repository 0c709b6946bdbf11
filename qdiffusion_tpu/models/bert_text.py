"""BERT-style text encoder for the LAION-400M text2img LDM.

Functional equivalent of the reference BERTEmbedder
(ldm/modules/encoders/modules.py:80-103): a lucidrains-style
TransformerWrapper + Encoder (ldm/modules/x_transformer.py). The default
config reproduces BERTEmbedder's defaults — token + learned absolute
position embeddings, pre-LayerNorm [attention, feed-forward] blocks
(heads=8, dim_head=64, bias-free q/k/v, GELU FF at mult 4), final
LayerNorm, embeddings returned (no logits head).

Beyond the default path, the non-default Encoder/TransformerWrapper
branches the reference carries are implemented too, value-for-value
against ldm/modules/x_transformer.py:

- padding masks / context masks (x_transformer.py:302-309, 332-334)
- cross-attention layer patterns: cross_attend / only_cross (:424-429)
- custom_layers / sandwich_coef / par_ratio layer-type schedules
  (:434-451)
- post-norm (pre_norm=False, :527-528), ScaleNorm / RMSNorm (:139-161),
  Rezero branches on attention layers (:128-136, :467-468)
- residual attention (prev_attn reinjection, :321-324, :522-525)
- GRU-gated residuals (GRUGating, :168-179)
- talking heads (:246-249, :326-327, :356-357), sparse top-k attention
  (:344-349), memory key/values (num_mem_kv, :258-262, :311-316),
  attention-on-attention GLU output (on_attn, :264-266)
- GLU feed-forward (GEGLU, :184-211), position-infused sinusoidal
  attention (FixedPositionalEmbedding, :39-49, :290-294)
- wrapper-level memory tokens, emb_dim != dim projection, tied or
  separate logits head (TransformerWrapper, :548-640)

Not carried over: `causal` (the reference's Encoder forbids it,
:541-544, and BERTEmbedder builds Encoders only); dropout (inference);
entmax15 (raises NotImplementedError in the reference, :231-232);
`macaron` follows upstream x-transformers semantics (FF halves scaled
0.5 around the block) — the reference's own macaron branch is unrunnable
as written (Scale.forward tuple-unpacks the FeedForward's tensor output,
x_transformer.py:117-125), so there is no torch behavior to match.

Tokenization (HF bert-base-uncased, vocab 30522) is external, as in the
reference; apply() takes token ids. Param trees come from
torch_import.state_dict_to_pytree over the TransformerWrapper state_dict
(2-D embedding tables land transposed under "w"; apply() accepts either
that or a raw "weight" entry).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu import nn

Array = jnp.ndarray

_MASK_VALUE = float(np.finfo(np.float32).max)


@dataclasses.dataclass(frozen=True)
class BERTTextConfig:
    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    heads: int = 8
    dim_head: int = 64
    # wrapper-level options (x_transformer.py TransformerWrapper)
    emb_dim: Optional[int] = None
    use_pos_emb: bool = True
    num_memory_tokens: int = 0
    tie_embedding: bool = False
    # layer-schedule options (AttentionLayers)
    cross_attend: bool = False
    only_cross: bool = False
    macaron: bool = False
    sandwich_coef: Optional[int] = None
    custom_layers: Optional[Tuple[str, ...]] = None
    par_ratio: Optional[int] = None
    pre_norm: bool = True
    use_scalenorm: bool = False
    use_rmsnorm: bool = False
    use_rezero: bool = False
    residual_attn: bool = False
    cross_residual_attn: bool = False
    gate_residual: bool = False
    position_infused_attn: bool = False
    # attention options
    talking_heads: bool = False
    sparse_topk: Optional[int] = None
    num_mem_kv: int = 0
    on_attn: bool = False
    # feed-forward options
    ff_mult: int = 4
    ff_glu: bool = False


def layer_schedule(cfg: BERTTextConfig) -> Tuple[str, ...]:
    """The ('a'|'c'|'f') layer-type sequence (x_transformer.py:424-451)."""
    if cfg.cross_attend and not cfg.only_cross:
        block = ("a", "c", "f")
    elif cfg.cross_attend and cfg.only_cross:
        block = ("c", "f")
    else:
        block = ("a", "f")
    if cfg.macaron:
        block = ("f",) + block

    if cfg.custom_layers is not None:
        return tuple(cfg.custom_layers)
    if cfg.par_ratio is not None:
        par_depth = cfg.n_layer * len(block)
        if not 1 < cfg.par_ratio <= par_depth:
            raise ValueError("par ratio out of range")
        block = tuple(t for t in block if t != "f")
        par_attn = par_depth // cfg.par_ratio
        depth_cut = par_depth * 2 // 3
        par_width = (depth_cut + depth_cut // par_attn) // par_attn
        if len(block) > par_width:
            raise ValueError("default block is too large for par_ratio")
        par_block = block + ("f",) * (par_width - len(block))
        par_head = par_block * par_attn
        return par_head + ("f",) * (par_depth - len(par_head))
    if cfg.sandwich_coef is not None:
        sc = cfg.sandwich_coef
        if not 0 < sc <= cfg.n_layer:
            raise ValueError("sandwich coefficient should be <= depth")
        return ("a",) * sc + block * (cfg.n_layer - sc) + ("f",) * sc
    return block * cfg.n_layer


def _emb_table(p: dict) -> Array:
    """Embedding weight from either a raw (V, D) 'weight' or the
    importer's transposed (D, V) 'w'."""
    if "weight" in p:
        return p["weight"]
    return jnp.transpose(p["w"])


def _sinusoidal(n: int, dim: int, dtype) -> Array:
    """FixedPositionalEmbedding (x_transformer.py:39-49), offset 0."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, np.float32) / dim))
    t = np.arange(n, dtype=np.float32)
    sin_inp = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
    return jnp.asarray(emb[None], dtype)


class BERTTextEncoder:
    def __init__(self, config: BERTTextConfig = BERTTextConfig()):
        self.cfg = config
        self.layer_types = layer_schedule(config)

    def apply(self, params: dict, input_ids: Array, *,
              mask: Optional[Array] = None,
              context: Optional[Array] = None,
              context_mask: Optional[Array] = None,
              return_logits: bool = False) -> Array:
        cfg = self.cfg
        p = params["transformer"]
        B, L = input_ids.shape
        tok = _emb_table(p["token_emb"])
        x = tok[input_ids]
        if cfg.use_pos_emb and not cfg.position_infused_attn:
            x = x + _emb_table(p["pos_emb"]["emb"])[None, :L, :]
        if "project_emb" in p:  # emb_dim != dim
            x = nn.dense(x, p["project_emb"]["w"], p["project_emb"]["b"])

        num_mem = cfg.num_memory_tokens
        if num_mem > 0:
            mem = jnp.broadcast_to(p["memory_tokens"][None],
                                   (B,) + p["memory_tokens"].shape)
            x = jnp.concatenate([mem.astype(x.dtype), x], axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones((B, num_mem), mask.dtype), mask], axis=1)

        x = self._attn_layers(p["attn_layers"], x, mask, context,
                              context_mask)
        x = nn.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])
        x = x[:, num_mem:]
        if not return_logits:
            return x
        if cfg.tie_embedding:
            return jnp.einsum("bld,vd->blv", x, tok)
        return nn.dense(x, p["to_logits"]["w"], p["to_logits"]["b"])

    # --- AttentionLayers (x_transformer.py:370-538) ---

    def _attn_layers(self, p: dict, x: Array, mask, context,
                     context_mask) -> Array:
        cfg = self.cfg
        layers = p["layers"]
        prev_attn = None
        prev_cross = None
        pia = (_sinusoidal(x.shape[1], cfg.n_embed, x.dtype)
               if cfg.position_infused_attn else None)
        n_layers = len(self.layer_types)
        for i, kind in enumerate(self.layer_types):
            blk = layers[str(i)]
            residual = x
            h = self._norm(blk.get("0", {}), x) if cfg.pre_norm else x
            if kind == "a":
                out, pre = self._attention(
                    self._inner(blk["1"]), h, mask=mask,
                    sinusoidal=pia, prev_attn=prev_attn)
                if cfg.residual_attn:
                    prev_attn = pre
                out = self._branch_scale(blk["1"], out)
            elif kind == "c":
                out, pre = self._attention(
                    self._inner(blk["1"]), h, context=context, mask=mask,
                    context_mask=context_mask, prev_attn=prev_cross)
                if cfg.cross_residual_attn:
                    prev_cross = pre
                out = self._branch_scale(blk["1"], out)
            else:
                ff_p = blk["1"]
                scale = 1.0
                if cfg.macaron:
                    ff_p = ff_p.get("fn", ff_p)
                    scale = 0.5
                out = self._feed_forward(ff_p, h) * scale
            x = self._residual(blk.get("2", {}), out, residual)
            if not cfg.pre_norm and i != n_layers - 1:
                x = self._norm(blk.get("0", {}), x)
        return x

    def _inner(self, p: dict) -> dict:
        # Rezero wraps attention layers only (x_transformer.py:467-468)
        return p["fn"] if self.cfg.use_rezero and "fn" in p else p

    def _branch_scale(self, p: dict, out: Array) -> Array:
        if self.cfg.use_rezero and "g" in p:
            return out * p["g"]
        return out

    def _norm(self, p: dict, x: Array) -> Array:
        cfg = self.cfg
        if cfg.use_rezero:
            return x  # norm_fn = Identity (x_transformer.py:421)
        if cfg.use_rmsnorm or cfg.use_scalenorm:
            # RMSNorm/ScaleNorm (x_transformer.py:139-161): both are the
            # L2 norm over the last axis scaled by dim**-0.5; RMSNorm's g
            # is per-channel, ScaleNorm's is a scalar
            xf = x.astype(jnp.float32)
            norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
            norm = norm * (self.cfg.n_embed ** -0.5)
            eps = 1e-8 if cfg.use_rmsnorm else 1e-5
            return (xf / jnp.maximum(norm, eps) * p["g"]).astype(x.dtype)
        if not p:
            return x
        return nn.layer_norm(x, p["scale"], p["bias"])

    def _residual(self, p: dict, out: Array, residual: Array) -> Array:
        if not self.cfg.gate_residual:
            return out + residual
        # GRUGating (x_transformer.py:168-179): torch GRUCell(out, residual)
        g = p["gru"]
        wi, wh = g["weight_ih"], g["weight_hh"]
        bi, bh = g["bias_ih"], g["bias_hh"]
        d = residual.shape[-1]
        gi = jnp.einsum("bld,gd->blg", out, wi) + bi
        gh = jnp.einsum("bld,gd->blg", residual, wh) + bh
        i_r, i_z, i_n = gi[..., :d], gi[..., d:2 * d], gi[..., 2 * d:]
        h_r, h_z, h_n = gh[..., :d], gh[..., d:2 * d], gh[..., 2 * d:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * residual

    # --- Attention (x_transformer.py:215-367) ---

    def _attention(self, p: dict, h: Array, *, context=None, mask=None,
                   context_mask=None, sinusoidal=None, prev_attn=None):
        cfg = self.cfg
        B, L, _ = h.shape
        nh, dh = cfg.heads, cfg.dim_head
        kv_in = context if context is not None else h
        q_in, k_in, v_in = h, kv_in, kv_in
        if sinusoidal is not None and context is None:
            # position-infused attention adds the sinusoid to q/k inputs
            # (x_transformer.py:290-294; offset 0 — no cached memories)
            q_in = q_in + sinusoidal[:, :L]
            k_in = k_in + sinusoidal[:, :k_in.shape[1]]
        q = nn.dense(q_in, p["to_q"]["w"]).reshape(B, L, nh, dh)
        Lk = k_in.shape[1]
        k = nn.dense(k_in, p["to_k"]["w"]).reshape(B, Lk, nh, dh)
        v = nn.dense(v_in, p["to_v"]["w"]).reshape(B, Lk, nh, dh)

        input_mask = None
        if mask is not None or context_mask is not None:
            q_mask = (jnp.ones((B, L), bool) if mask is None
                      else mask.astype(bool))
            if context is None:
                k_mask = q_mask
            elif context_mask is not None:
                k_mask = context_mask.astype(bool)
            else:
                k_mask = jnp.ones((B, Lk), bool)
            input_mask = q_mask[:, None, :, None] & k_mask[:, None, None, :]

        if cfg.num_mem_kv > 0:
            mem_k = jnp.broadcast_to(p["mem_k"][None],
                                     (B,) + p["mem_k"].shape)
            mem_v = jnp.broadcast_to(p["mem_v"][None],
                                     (B,) + p["mem_v"].shape)
            # mem_k/v are (H, M, D); k/v are (B, L, H, D)
            k = jnp.concatenate(
                [jnp.transpose(mem_k, (0, 2, 1, 3)).astype(k.dtype), k],
                axis=1)
            v = jnp.concatenate(
                [jnp.transpose(mem_v, (0, 2, 1, 3)).astype(v.dtype), v],
                axis=1)
            if input_mask is not None:
                pad = jnp.ones(input_mask.shape[:3] + (cfg.num_mem_kv,),
                               bool)
                input_mask = jnp.concatenate([pad, input_mask], axis=-1)

        dots = jnp.einsum("bihd,bjhd->bhij", q, k,
                          preferred_element_type=jnp.float32) * (dh ** -0.5)
        if prev_attn is not None:
            dots = dots + prev_attn
        pre_softmax = dots  # captured after prev_attn add (:321-324)

        if cfg.talking_heads:
            dots = jnp.einsum("bhij,hk->bkij", dots, p["pre_softmax_proj"])
        if input_mask is not None:
            dots = jnp.where(input_mask, dots, -_MASK_VALUE)
        if cfg.sparse_topk is not None and cfg.sparse_topk < dots.shape[-1]:
            top = jax.lax.top_k(dots, cfg.sparse_topk)[0]
            vk = top[..., -1:]
            dots = jnp.where(dots < vk, -_MASK_VALUE, dots)

        attn = jax.nn.softmax(dots, axis=-1)
        if cfg.talking_heads:
            attn = jnp.einsum("bhij,hk->bkij", attn, p["post_softmax_proj"])
        o = jnp.einsum("bhij,bjhd->bihd", attn, v,
                       preferred_element_type=jnp.float32).astype(h.dtype)
        o = o.reshape(B, L, nh * dh)
        if cfg.on_attn:
            # to_out = Linear(inner, 2*dim) + GLU (x_transformer.py:266)
            y = nn.dense(o, p["to_out"]["0"]["w"], p["to_out"]["0"]["b"])
            a, b = jnp.split(y, 2, axis=-1)
            out = a * jax.nn.sigmoid(b)
        else:
            out = nn.dense(o, p["to_out"]["w"], p["to_out"]["b"])
        return out, pre_softmax

    # --- FeedForward (x_transformer.py:184-211) ---

    def _feed_forward(self, p: dict, h: Array) -> Array:
        if self.cfg.ff_glu:
            y = nn.dense(h, p["net"]["0"]["proj"]["w"],
                         p["net"]["0"]["proj"]["b"])
            a, gate = jnp.split(y, 2, axis=-1)
            ff = a * nn.gelu(gate)
        else:
            ff = nn.gelu(nn.dense(h, p["net"]["0"]["0"]["w"],
                                  p["net"]["0"]["0"]["b"]))
        return nn.dense(ff, p["net"]["2"]["w"], p["net"]["2"]["b"])
