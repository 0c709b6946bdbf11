"""First-stage autoencoders: AutoencoderKL and VQ models (decode path).

Functional NHWC re-design of the reference VAE convnet family
(ldm/modules/diffusionmodules/model.py:85-545 Encoder/Decoder with
temb-less ResnetBlocks and single-head AttnBlocks) plus:

  * VectorQuantizer nearest-codebook lookup (taming VectorQuantizer2
    semantics as used by VQModelInterface.decode, autoencoder.py:264-283);
  * DiagonalGaussianDistribution sample/mode (distributions.py:24-62);
  * quant_conv / post_quant_conv 1x1 projections (autoencoder.py:300-334).

The UNet is the only quantized network in the reference; the VAE runs full
precision, so these forwards take no QuantCtx. Param trees mirror torch
state_dict names (encoder.*, decoder.*, quant_conv, post_quant_conv,
quantize.embedding.weight).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 3
    double_z: bool = False
    embed_dim: int = 3
    n_embed: Optional[int] = None  # set -> VQ model; None -> KL model


def _resnet(p: dict, x: Array) -> Array:
    h = nn.group_norm_swish(x, p["norm1"]["scale"], p["norm1"]["bias"],
                            fused_ok=True)
    h = nn.conv2d(h, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    h = nn.group_norm_swish(h, p["norm2"]["scale"], p["norm2"]["bias"],
                            fused_ok=True)
    h = nn.conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    if "nin_shortcut" in p:
        x = nn.conv2d(x, p["nin_shortcut"]["w"], p["nin_shortcut"]["b"],
                      padding="VALID")
    elif "conv_shortcut" in p:
        x = nn.conv2d(x, p["conv_shortcut"]["w"], p["conv_shortcut"]["b"],
                      padding=1)
    return x + h


# Single-head D=512 attention over hh*ww tokens (model.py:AttnBlock).
# At >= this many tokens (SD 512^2 decode: 4096 tokens at the mid block)
# the materializing (S, S) path leaves VMEM reach and the flash dispatch
# takes over: resident Pallas flash when 2x(S, 512) K/V fits scoped VMEM,
# the streaming two-pass kernel otherwise (its footprint is S-independent
# and D-generic — Dp=512 is four 128-lane tiles).
_FLASH_TOKENS = 1024


def _attn(p: dict, x: Array) -> Array:
    b, hh, ww, c = x.shape
    h = nn.group_norm(x, p["norm"]["scale"], p["norm"]["bias"],
                      fused_ok=True)
    q = nn.conv2d(h, p["q"]["w"], p["q"]["b"], padding="VALID")
    k = nn.conv2d(h, p["k"]["w"], p["k"]["b"], padding="VALID")
    v = nn.conv2d(h, p["v"]["w"], p["v"]["b"], padding="VALID")
    q = q.reshape(b, hh * ww, c)
    k = k.reshape(b, hh * ww, c)
    v = v.reshape(b, hh * ww, c)
    scale = int(c) ** -0.5
    if hh * ww >= _FLASH_TOKENS and jax.default_backend() == "tpu":
        from qdiffusion_tpu.ops.attention import blockwise_attention

        h = blockwise_attention(q[:, :, None, :], k[:, :, None, :],
                                v[:, :, None, :], scale=scale)[:, :, 0, :]
        h = h.astype(x.dtype)
    else:
        w = jnp.einsum("bic,bjc->bij", q, k,
                       preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(w, axis=2)
        h = jnp.einsum("bij,bjc->bic", w, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    h = h.reshape(b, hh, ww, c)
    h = nn.conv2d(h, p["proj_out"]["w"], p["proj_out"]["b"], padding="VALID")
    return x + h


class VAE:
    """KL or VQ autoencoder; decode is the hot path for LDM sampling."""

    def __init__(self, config: VAEConfig):
        self.cfg = config
        cfg = config
        self.num_resolutions = len(cfg.ch_mult)
        self.attn_at = set(cfg.attn_resolutions)

    # -- init -------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> dict:
        """Random param tree with the exact structure decode/encode expect
        (channel progression mirrors the reference Encoder/Decoder,
        ldm/modules/diffusionmodules/model.py:368-545). Real weights come
        from torch_import; this exists for tests/demos and API symmetry
        with the UNets."""
        cfg = self.cfg
        counter = [0]

        def key():
            counter[0] += 1
            return jax.random.fold_in(rng, counter[0])

        def conv(ci, co, k=3):
            fan = k * k * ci
            return {"w": jax.random.normal(key(), (k, k, ci, co)) / fan**0.5,
                    "b": jnp.zeros((co,))}

        def norm(c):
            return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

        def resnet(ci, co):
            p = {"norm1": norm(ci), "conv1": conv(ci, co),
                 "norm2": norm(co), "conv2": conv(co, co)}
            if ci != co:
                p["nin_shortcut"] = conv(ci, co, 1)
            return p

        def attn(c):
            return {"norm": norm(c), "q": conv(c, c, 1), "k": conv(c, c, 1),
                    "v": conv(c, c, 1), "proj_out": conv(c, c, 1)}

        n_res = self.num_resolutions
        in_mult = (1,) + tuple(cfg.ch_mult)
        # encoder
        enc: dict = {"conv_in": conv(cfg.in_channels, cfg.ch), "down": {}}
        curr_res = cfg.resolution
        for i in range(n_res):
            ci, co = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
            lvl: dict = {"block": {}, "attn": {}}
            for j in range(cfg.num_res_blocks):
                lvl["block"][str(j)] = resnet(ci if j == 0 else co, co)
                if curr_res in self.attn_at:
                    lvl["attn"][str(j)] = attn(co)
            if i != n_res - 1:
                lvl["downsample"] = {"conv": conv(co, co)}
                curr_res //= 2
            if not lvl["attn"]:
                del lvl["attn"]
            enc["down"][str(i)] = lvl
        cm = cfg.ch * cfg.ch_mult[-1]
        enc["mid"] = {"block_1": resnet(cm, cm), "attn_1": attn(cm),
                      "block_2": resnet(cm, cm)}
        enc["norm_out"] = norm(cm)
        z_out = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        enc["conv_out"] = conv(cm, z_out)
        # decoder
        dec: dict = {"conv_in": conv(cfg.z_channels, cm),
                     "mid": {"block_1": resnet(cm, cm), "attn_1": attn(cm),
                             "block_2": resnet(cm, cm)},
                     "up": {}}
        ci = cm
        curr_res = cfg.resolution // 2 ** (n_res - 1)
        for i in reversed(range(n_res)):
            co = cfg.ch * cfg.ch_mult[i]
            lvl = {"block": {}, "attn": {}}
            for j in range(cfg.num_res_blocks + 1):
                lvl["block"][str(j)] = resnet(ci if j == 0 else co, co)
                if curr_res in self.attn_at:
                    lvl["attn"][str(j)] = attn(co)
            if i != 0:
                lvl["upsample"] = {"conv": conv(co, co)}
                curr_res *= 2
            if not lvl["attn"]:
                del lvl["attn"]
            dec["up"][str(i)] = lvl
            ci = co
        dec["norm_out"] = norm(ci)
        dec["conv_out"] = conv(ci, cfg.out_ch)
        params = {"encoder": enc, "decoder": dec,
                  "quant_conv": conv(z_out, 2 * cfg.embed_dim
                                     if cfg.double_z else cfg.embed_dim, 1),
                  "post_quant_conv": conv(cfg.embed_dim, cfg.z_channels, 1)}
        if cfg.n_embed is not None:
            params["quantize"] = {"embedding": {
                "weight": jax.random.normal(key(),
                                            (cfg.n_embed, cfg.embed_dim))}}
        return params

    # -- decoder --------------------------------------------------------

    def decode(self, params: dict, z: Array,
               force_not_quantize: bool = False) -> Array:
        """z: NHWC latents -> image. For VQ models the latent first snaps to
        the codebook (VQModelInterface.decode, autoencoder.py:274-283)."""
        cfg = self.cfg
        if cfg.n_embed is not None and not force_not_quantize:
            z = self.vq_lookup(params, z)
        z = nn.conv2d(z, params["post_quant_conv"]["w"],
                      params["post_quant_conv"]["b"], padding="VALID")
        p = params["decoder"]
        h = nn.conv2d(z, p["conv_in"]["w"], p["conv_in"]["b"], padding=1)
        h = _resnet(p["mid"]["block_1"], h)
        h = _attn(p["mid"]["attn_1"], h)
        h = _resnet(p["mid"]["block_2"], h)
        curr_res = cfg.resolution // 2 ** (self.num_resolutions - 1)
        for i_level in reversed(range(self.num_resolutions)):
            lvl = p["up"][str(i_level)]
            for i_block in range(cfg.num_res_blocks + 1):
                h = _resnet(lvl["block"][str(i_block)], h)
                if curr_res in self.attn_at:
                    h = _attn(lvl["attn"][str(i_block)], h)
            if i_level != 0:
                h = nn.upsample_nearest_2x(h)
                if "upsample" in lvl:
                    h = nn.conv2d(h, lvl["upsample"]["conv"]["w"],
                                  lvl["upsample"]["conv"]["b"], padding=1)
                curr_res *= 2
        h = nn.group_norm_swish(h, p["norm_out"]["scale"],
                                p["norm_out"]["bias"], fused_ok=True)
        return nn.conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)

    # -- encoder --------------------------------------------------------

    def encode_moments(self, params: dict, x: Array) -> Array:
        """Image -> latent moments (KL: 2*embed_dim channels) or pre-quant
        latent (VQ)."""
        cfg = self.cfg
        p = params["encoder"]
        h = nn.conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"], padding=1)
        curr_res = cfg.resolution
        for i_level in range(self.num_resolutions):
            lvl = p["down"][str(i_level)]
            for i_block in range(cfg.num_res_blocks):
                h = _resnet(lvl["block"][str(i_block)], h)
                if curr_res in self.attn_at:
                    h = _attn(lvl["attn"][str(i_block)], h)
            if i_level != self.num_resolutions - 1:
                if "downsample" in lvl:
                    h = nn.pad_asymmetric_downsample(h)
                    h = nn.conv2d(h, lvl["downsample"]["conv"]["w"],
                                  lvl["downsample"]["conv"]["b"],
                                  stride=2, padding="VALID")
                else:
                    h = nn.avg_pool_2x(h)
                curr_res //= 2
        h = _resnet(p["mid"]["block_1"], h)
        h = _attn(p["mid"]["attn_1"], h)
        h = _resnet(p["mid"]["block_2"], h)
        h = nn.group_norm_swish(h, p["norm_out"]["scale"],
                                p["norm_out"]["bias"], fused_ok=True)
        h = nn.conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)
        return nn.conv2d(h, params["quant_conv"]["w"],
                         params["quant_conv"]["b"], padding="VALID")

    def encode_kl(self, params: dict, x: Array, rng: Optional[jax.Array] = None,
                  sample: bool = True) -> Array:
        """KL encode: sample (or take the mode of) the diagonal Gaussian
        posterior (reference DiagonalGaussianDistribution)."""
        moments = self.encode_moments(params, x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if not sample:
            return mean
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        noise = jax.random.normal(rng or jax.random.PRNGKey(0), mean.shape,
                                  mean.dtype)
        return mean + std * noise

    # -- vector quantizer ------------------------------------------------

    def vq_lookup(self, params: dict, z: Array) -> Array:
        """Nearest-codebook snap (taming VectorQuantizer2 forward)."""
        emb = params["quantize"]["embedding"]["weight"]  # (n_embed, e_dim)
        b, h, w, c = z.shape
        flat = z.reshape(-1, c)
        d = (jnp.sum(flat**2, axis=1, keepdims=True)
             - 2.0 * flat @ emb.T
             + jnp.sum(emb**2, axis=1)[None, :])
        idx = jnp.argmin(d, axis=1)
        quant = emb[idx].reshape(b, h, w, c)
        # straight-through (decode-only path doesn't need the gradient, but
        # keep parity with the reference formulation)
        return z + jax.lax.stop_gradient(quant - z)
