"""EncoderUNetModel: the classifier half-UNet (encoder torso + pooled head).

Functional equivalent of reference openaimodel.py:785-1001 — the downsample
half of the UNet with timestep embedding, used for noise-aware classifier
guidance. Unused by the reference's main PTQ flow but part of its model
inventory. Reuses the LDM UNet's block machinery; heads: 'adaptive'
(norm-silu-globalpool-1x1conv) and 'spatial' (per-stage pooled features ->
MLP).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from qdiffusion_tpu import nn
from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig
from qdiffusion_tpu.quant.context import QuantCtx

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EncoderUNetConfig(LDMUNetConfig):
    pool: str = "adaptive"  # 'adaptive' | 'spatial'


class EncoderUNet(LDMUNet):
    """Half-UNet encoder with pooled classification head."""

    def __init__(self, config: EncoderUNetConfig,
                 policy=None, act_quant_partition: bool = False):
        super().__init__(config, policy, act_quant_partition)
        # drop the decoder half registered by the parent build
        drop = {u.name for u in self._units
                if u.name.startswith("output_blocks.") or u.name == "out.2"}
        self._units = [u for u in self._units if u.name not in drop]
        for name in [n for n in self._layer_cfgs
                     if n.startswith("output_blocks.") or n == "out.2"]:
            del self._layer_cfgs[name]
        self.output_plan = []
        self._unit_map = {u.name: u for u in self._units}
        self._mid_ch = self.cfg.model_channels * self.cfg.channel_mult[-1]
        # feature size for the spatial head: sum of per-stage channels
        feats = [self.cfg.model_channels]
        for entry in self.input_plan[1:]:
            last = entry[-1]
            feats.append(last.get("out_ch") or last.get("ch")
                         or self._conv_sizes.get(last["name"], (0, 0))[1])
        self._spatial_feats = sum(feats) + self._mid_ch

    def apply(self, params: dict, x: Array, t: Array,
              ctx: Optional[QuantCtx] = None,
              context: Optional[Array] = None) -> Array:
        ctx = ctx or QuantCtx()
        cfg = self.cfg
        temb = nn.timestep_embedding(t, cfg.model_channels,
                                     fairseq=False).astype(x.dtype)
        emb = self._run_unit(params, ctx, "time_embed.0", temb)
        emb = nn.swish(emb)
        emb = self._run_unit(params, ctx, "time_embed.2", emb)

        results = []
        h = x
        for entry in self.input_plan:
            h = self._apply_entry(params, ctx, entry, h, emb, context)
            if cfg.pool.startswith("spatial"):
                results.append(jnp.mean(h, axis=(1, 2)))
        for item in self.middle_plan:
            h = self._apply_entry(params, ctx, [item], h, emb, context)

        out = params["out"]
        if cfg.pool == "adaptive":
            h = nn.group_norm(h, out["0"]["scale"], out["0"]["bias"],
                              eps=1e-5)
            h = nn.swish(h)
            h = jnp.mean(h, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool(1)
            h = nn.conv2d(h, out["3"]["w"], out["3"]["b"], padding="VALID")
            return h.reshape(h.shape[0], -1)
        if cfg.pool == "spatial":
            results.append(jnp.mean(h, axis=(1, 2)))
            feats = jnp.concatenate(results, axis=-1)
            hm = nn.dense(feats, out["0"]["w"], out["0"]["b"])
            hm = jax.nn.relu(hm)
            return nn.dense(hm, out["2"]["w"], out["2"]["b"])
        raise NotImplementedError(cfg.pool)

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict:
        params = super().init_params(rng, dtype)
        for k in ("output_blocks",):
            params.pop(k, None)
        keys = jax.random.split(jax.random.fold_in(rng, 1), 4)
        cfg = self.cfg
        ch = self._mid_ch
        if cfg.pool == "adaptive":
            params["out"] = {
                "0": {"scale": jnp.ones((ch,), dtype),
                      "bias": jnp.zeros((ch,), dtype)},
                "3": {"w": jnp.zeros((1, 1, ch, cfg.out_channels), dtype),
                      "b": jnp.zeros((cfg.out_channels,), dtype)},
            }
        else:
            f = self._spatial_feats
            params["out"] = {
                "0": {"w": jax.random.normal(keys[0], (f, 2048), dtype)
                      / jnp.sqrt(f), "b": jnp.zeros((2048,), dtype)},
                "2": {"w": jax.random.normal(keys[1],
                                             (2048, cfg.out_channels), dtype)
                      / jnp.sqrt(2048.0),
                      "b": jnp.zeros((cfg.out_channels,), dtype)},
            }
        return params
