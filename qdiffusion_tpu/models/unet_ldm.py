"""LDM / Stable-Diffusion UNet (OpenAI lineage), TPU-native.

Functional re-design of the reference architecture
(ldm/modules/diffusionmodules/openaimodel.py:447-782 and
ldm/modules/attention.py): NHWC activations, (B, T, C) token layout, pure
forward over a params pytree whose keys mirror the torch state_dict
(time_embed.0, input_blocks.{i}.{j}..., middle_block.{k},
output_blocks.{i}.{j}, out.{k}).

Supported variants (all used by the reference model zoo):
  * plain AttentionBlock self-attention with multi-head QKV conv1d
    (LSUN beds/churches), legacy head-split order, scale 1/sqrt(sqrt(ch));
  * SpatialTransformer cross-attention with GEGLU feed-forward
    (Stable Diffusion, context_dim=768);
  * use_scale_shift_norm (FiLM) and resblock_updown (LSUN churches);
  * split-shortcut quantization: every output-block ResBlock skip conv
    splits at the channel boundary of the concat (openaimodel.py:772-777).

Quantizer placement parity (qdiff/quant_block.py):
  * AttentionBlock matmuls: q/k quantized *after* the 1/sqrt(sqrt(ch))
    scaling (QuantQKMatMul, :123-134); post-softmax weights at sm_abit with
    symmetric=False, always_zero=True (QuantSMVMatMul, :140-157).
  * Transformer cross-attention: q/k quantized after head-split *before*
    scaling; attn weights at sm_abit always_zero (cross_attn_forward,
    :190-221 — the monkey-patched path, not the CrossQKMatMul modules).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu import nn
from qdiffusion_tpu.models.base import QuantModelBase, ReconUnit, _sub
from qdiffusion_tpu.ops.qlayers import qconv1d, qconv2d, qdense
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import QuantCtx

Array = jnp.ndarray

# Key-length at which attention auto-dispatches to the flash path at
# inference (measured crossover on v5e, scripts/bench_attention.py: the
# Pallas kernel ties or wins fp+quantized from 1024 tokens — 1.9x fp /
# 1.14x quant at 4096; see PERF_NOTES.md).
FLASH_SEQ_DEFAULT = 1024


@dataclasses.dataclass(frozen=True)
class LDMUNetConfig:
    image_size: int = 32
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)  # downsample rates
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    legacy: bool = True
    split_shortcut: bool = False
    num_classes: Optional[int] = None  # class-conditional ('adm') models

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


@dataclasses.dataclass(frozen=True)
class LDMQuantPolicy:
    """LDM/SD quantizer specs (reference scripts: 'mse' weights, 'mse' or
    'max' acts, sample_diffusion_ldm.py:456-462 / txt2img.py:373-383)."""

    wq: AffineQuantizerSpec = AffineQuantizerSpec(
        n_bits=8, channel_wise=True, channel_axis=-1, scale_method="mse")
    aq: AffineQuantizerSpec = AffineQuantizerSpec(
        n_bits=8, symmetric=False, channel_wise=False, scale_method="mse",
        leaf_param=True)
    sm_abit: int = 8

    @property
    def sm_aq_transformer(self) -> AffineQuantizerSpec:
        # quant_block.py:248-252
        return self.aq.replace(n_bits=self.sm_abit, always_zero=True)

    @property
    def sm_aq_smv(self) -> AffineQuantizerSpec:
        # quant_block.py:146-150
        return self.aq.replace(n_bits=self.sm_abit, symmetric=False,
                               always_zero=True)


def _heads_for(cfg: LDMUNetConfig, ch: int, upsample: bool = False):
    """Effective (heads, dim_head) at an attention site, reproducing the
    legacy head-count logic (openaimodel.py:575-586)."""
    if cfg.num_head_channels == -1:
        heads = cfg.num_heads
        dim_head = ch // cfg.num_heads
    else:
        heads = ch // cfg.num_head_channels
        dim_head = cfg.num_head_channels
    if cfg.legacy:
        dim_head = ch // heads if cfg.use_spatial_transformer else cfg.num_head_channels
    if upsample and cfg.num_heads_upsample != -1 and not cfg.use_spatial_transformer:
        heads = cfg.num_heads_upsample
    # AttentionBlock resolves heads from num_head_channels when set
    if not cfg.use_spatial_transformer and dim_head != -1:
        heads = ch // dim_head
    return heads, dim_head


class LDMUNet(QuantModelBase):
    """OpenAI-style UNet with optional spatial transformers."""

    def __init__(self, config: LDMUNetConfig,
                 policy: Optional[LDMQuantPolicy] = None,
                 act_quant_partition: bool = False,
                 flash_threshold: Optional[int] = None):
        """act_quant_partition: when True, AttentionBlocks decompose into
        qkv/proj_out layer units + matmul act units (reference get_specials
        with leaf_param=True, quant_block.py:389-401); when False the whole
        AttentionBlock is one reconstruction unit.

        flash_threshold: KEY sequence length at or above which attention
        dispatches to the flash path (ops/attention.py::blockwise_attention
        -> the Pallas VMEM-tile kernel on TPU) instead of materializing the
        (T, S) matrix — subsumes the reference's is_sm 4096-token memory
        workaround. None (default) = FLASH_SEQ_DEFAULT, where the Pallas
        kernel is measured faster than the materializing path on v5e for
        both fp and quantized inference (scripts/bench_attention.py);
        0 disables. Gating on the key length keeps 77-token
        cross-attention contexts on the cheap materializing path.
        Calibration-time passes (collect / capture / substitute /
        differentiable reconstruction forwards) always materialize —
        block reconstruction caches the matmul operands and differentiates
        through the block, and the Pallas kernel defines no VJP; the int8
        engine keeps its integer matmul path."""
        super().__init__()
        self.cfg = config
        self.policy = policy or LDMQuantPolicy()
        self.act_quant_partition = act_quant_partition
        self.flash_threshold = (FLASH_SEQ_DEFAULT if flash_threshold is None
                                else flash_threshold)
        self._conv_sizes = {}
        self._build()
        self._unit_map = {u.name: u for u in self._units}

    def _use_blockwise(self, ctx: QuantCtx, key_len: int) -> bool:
        return (self.flash_threshold > 0 and key_len >= self.flash_threshold
                and ctx.collect is None and ctx.capture is None
                and not ctx.substitute and not ctx.differentiable
                and ctx.engine != "int8")

    # ------------------------------------------------------------------
    # static construction (mirrors openaimodel.py:545-745)
    # ------------------------------------------------------------------

    def _build(self):
        cfg = self.cfg
        self._plans = {}  # name -> plan dict for blocks

        self._lcfg("time_embed.0", in_axis=0)
        self._lcfg("time_embed.2", in_axis=0)
        self._units.append(ReconUnit(
            "time_embed.0", "layer",
            lambda p, ctx, x: qdense(ctx, "time_embed.0",
                                     _sub(p, "time_embed.0"), x,
                                     self._layer_cfgs["time_embed.0"]),
            ["time_embed.0"]))
        self._units.append(ReconUnit(
            "time_embed.2", "layer",
            lambda p, ctx, x: qdense(ctx, "time_embed.2",
                                     _sub(p, "time_embed.2"), x,
                                     self._layer_cfgs["time_embed.2"]),
            ["time_embed.2"]))

        self.input_plan: List[List[dict]] = []
        name = "input_blocks.0.0"
        self._lcfg(name)
        self._register_layer_conv(name, padding=1)
        self._conv_sizes[name] = (cfg.in_channels, cfg.model_channels)
        self.input_plan.append([dict(kind="conv", name=name, padding=1)])

        input_block_chans = [cfg.model_channels]
        ch = cfg.model_channels
        ds = 1
        idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                entry = []
                rb = self._register_resblock(
                    f"input_blocks.{idx}.0", ch, mult * cfg.model_channels,
                    split=0)
                entry.append(rb)
                ch = mult * cfg.model_channels
                if ds in cfg.attention_resolutions:
                    entry.append(self._register_attention(
                        f"input_blocks.{idx}.1", ch))
                self.input_plan.append(entry)
                input_block_chans.append(ch)
                idx += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    rb = self._register_resblock(
                        f"input_blocks.{idx}.0", ch, ch, split=0, updown="down")
                    self.input_plan.append([rb])
                else:
                    nm = f"input_blocks.{idx}.0.op"
                    self._lcfg(nm)
                    self._register_layer_conv(nm, padding=1, stride=2)
                    self._conv_sizes[nm] = (ch, ch)
                    self.input_plan.append([dict(kind="conv", name=nm,
                                                 padding=1, stride=2)])
                input_block_chans.append(ch)
                ds *= 2
                idx += 1

        self.middle_plan = [
            self._register_resblock("middle_block.0", ch, ch, split=0),
            self._register_attention("middle_block.1", ch),
            self._register_resblock("middle_block.2", ch, ch, split=0),
        ]

        self.output_plan: List[List[dict]] = []
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                oi = len(self.output_plan)
                ich = input_block_chans.pop()
                split = ch if cfg.split_shortcut else 0
                entry = [self._register_resblock(
                    f"output_blocks.{oi}.0", ch + ich,
                    cfg.model_channels * mult, split=split)]
                ch = cfg.model_channels * mult
                j = 1
                if ds in cfg.attention_resolutions:
                    entry.append(self._register_attention(
                        f"output_blocks.{oi}.{j}", ch, upsample=True))
                    j += 1
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        entry.append(self._register_resblock(
                            f"output_blocks.{oi}.{j}", ch, ch, split=0,
                            updown="up"))
                    else:
                        nm = f"output_blocks.{oi}.{j}.conv"
                        self._lcfg(nm)
                        self._register_layer_conv(nm, padding=1,
                                                  upsample_first=True)
                        self._conv_sizes[nm] = (ch, ch)
                        entry.append(dict(kind="upsample_conv", name=nm))
                    ds //= 2
                self.output_plan.append(entry)

        self._lcfg("out.2")
        self._register_layer_conv("out.2", padding=1)
        self.out_ch_in = ch

    def _register_layer_conv(self, name: str, padding=1, stride=1,
                             upsample_first=False):
        def apply(p, ctx, x, name=name, padding=padding, stride=stride,
                  upsample_first=upsample_first):
            if upsample_first:
                x = nn.upsample_nearest_2x(x)
            return qconv2d(ctx, name, _sub(p, name), x,
                           self._layer_cfgs[name], stride=stride,
                           padding=padding)

        self._units.append(ReconUnit(name, "layer", apply, [name]))

    def _register_resblock(self, name: str, in_ch: int, out_ch: int,
                           split: int, updown: Optional[str] = None) -> dict:
        cfg = self.cfg
        plan = dict(kind="resblock", name=name, in_ch=in_ch, out_ch=out_ch,
                    split=split, updown=updown,
                    scale_shift=cfg.use_scale_shift_norm,
                    skip="identity" if in_ch == out_ch else "conv1")
        self._plans[name] = plan
        self._lcfg(f"{name}.in_layers.2")
        self._lcfg(f"{name}.emb_layers.1", in_axis=0)
        self._lcfg(f"{name}.out_layers.3")
        layers = [f"{name}.in_layers.2", f"{name}.emb_layers.1",
                  f"{name}.out_layers.3"]
        if plan["skip"] != "identity":
            self._lcfg(f"{name}.skip_connection", split=split)
            layers.append(f"{name}.skip_connection")
        self._units.append(ReconUnit(
            name, "resblock",
            (lambda plan: lambda p, ctx, x, emb: self._resblock(
                p, ctx, x, emb, plan))(plan),
            layers, takes_temb=True))
        return plan

    def _register_attention(self, name: str, ch: int,
                            upsample: bool = False) -> dict:
        cfg = self.cfg
        heads, dim_head = _heads_for(cfg, ch, upsample)
        if cfg.use_spatial_transformer:
            return self._register_spatial_transformer(name, ch, heads, dim_head)
        return self._register_attnblock(name, ch, heads)

    def _register_attnblock(self, name: str, ch: int, heads: int) -> dict:
        plan = dict(kind="attnblock", name=name, ch=ch, heads=heads)
        self._plans[name] = plan
        self._lcfg(f"{name}.qkv", in_axis=1)
        self._lcfg(f"{name}.proj_out", in_axis=1)
        if self.act_quant_partition:
            # reference specials with leaf_param=True: layer units for the
            # convs + act-only matmul units (quant_block.py:396-398)
            self._units.append(ReconUnit(
                f"{name}.qkv", "layer",
                (lambda name: lambda p, ctx, x: self._attnblock_qkv(
                    p, ctx, x, name))(name),
                [f"{name}.qkv"]))
            self._units.append(ReconUnit(
                f"{name}.attention.qkv_matmul", "qkmatmul",
                (lambda plan: lambda p, ctx, q, k: self._qk_matmul(
                    ctx, q, k, plan))(plan),
                [], loss_axis=2))
            self._units.append(ReconUnit(
                f"{name}.attention.smv_matmul", "smvmatmul",
                (lambda plan: lambda p, ctx, w, v: self._smv_matmul(
                    ctx, w, v, plan))(plan),
                [], loss_axis=-1))
            self._units.append(ReconUnit(
                f"{name}.proj_out", "layer",
                (lambda name: lambda p, ctx, x: self._attnblock_proj(
                    p, ctx, x, name))(name),
                [f"{name}.proj_out"]))
        else:
            self._units.append(ReconUnit(
                name, "attnblock",
                (lambda plan: lambda p, ctx, x: self._attnblock(
                    p, ctx, x, plan))(plan),
                [f"{name}.qkv", f"{name}.proj_out"]))
        return plan

    def _register_spatial_transformer(self, name: str, ch: int, heads: int,
                                      dim_head: int) -> dict:
        cfg = self.cfg
        inner = heads * dim_head
        plan = dict(kind="transformer", name=name, ch=ch, heads=heads,
                    dim_head=dim_head, inner=inner,
                    depth=cfg.transformer_depth,
                    context_dim=cfg.context_dim)
        self._plans[name] = plan
        self._lcfg(f"{name}.proj_in")
        self._register_layer_conv(f"{name}.proj_in", padding="VALID")
        for d in range(cfg.transformer_depth):
            tb = f"{name}.transformer_blocks.{d}"
            for attn in ("attn1", "attn2"):
                for leaf in ("to_q", "to_k", "to_v"):
                    self._lcfg(f"{tb}.{attn}.{leaf}", in_axis=0)
                self._lcfg(f"{tb}.{attn}.to_out.0", in_axis=0)
            self._lcfg(f"{tb}.ff.net.0.proj", in_axis=0)
            self._lcfg(f"{tb}.ff.net.2", in_axis=0)
            tplan = dict(plan, tb=tb)
            self._units.append(ReconUnit(
                tb, "transformer",
                (lambda tplan: lambda p, ctx, x, context: self._transformer_block(
                    p, ctx, x, context, tplan))(tplan),
                [f"{tb}.{a}.{l}" for a in ("attn1", "attn2")
                 for l in ("to_q", "to_k", "to_v", "to_out.0")]
                + [f"{tb}.ff.net.0.proj", f"{tb}.ff.net.2"],
                takes_temb=True, loss_axis=1))
            self._units[-1].extra_sites = [f"{tb}.attn1", f"{tb}.attn2"]
        self._lcfg(f"{name}.proj_out")
        self._register_layer_conv(f"{name}.proj_out", padding="VALID")
        return plan

    # ------------------------------------------------------------------
    # forward pieces
    # ------------------------------------------------------------------

    def _resblock(self, p: dict, ctx: QuantCtx, x: Array, emb: Array,
                  plan: dict) -> Array:
        name = plan["name"]
        sp = _sub(p, name)
        h = nn.group_norm_swish(x, sp["in_layers"]["0"]["scale"],
                                sp["in_layers"]["0"]["bias"], eps=1e-5,
                                fused_ok=not ctx.differentiable)
        if plan["updown"] == "up":
            h = nn.upsample_nearest_2x(h)
            x = nn.upsample_nearest_2x(x)
        elif plan["updown"] == "down":
            h = nn.avg_pool_2x(h)
            x = nn.avg_pool_2x(x)
        h = qconv2d(ctx, f"{name}.in_layers.2", sp["in_layers"]["2"], h,
                    self._layer_cfgs[f"{name}.in_layers.2"], padding=1)
        emb_out = qdense(ctx, f"{name}.emb_layers.1", sp["emb_layers"]["1"],
                         nn.swish(emb),
                         self._layer_cfgs[f"{name}.emb_layers.1"])
        if plan["scale_shift"]:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.group_norm(h, sp["out_layers"]["0"]["scale"],
                              sp["out_layers"]["0"]["bias"], eps=1e-5,
                              fused_ok=not ctx.differentiable)
            h = h * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
            h = nn.swish(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = nn.group_norm_swish(h, sp["out_layers"]["0"]["scale"],
                                    sp["out_layers"]["0"]["bias"], eps=1e-5,
                                    fused_ok=not ctx.differentiable)
        h = qconv2d(ctx, f"{name}.out_layers.3", sp["out_layers"]["3"], h,
                    self._layer_cfgs[f"{name}.out_layers.3"], padding=1)
        if plan["skip"] == "identity":
            return x + h
        return qconv2d(ctx, f"{name}.skip_connection", sp["skip_connection"],
                       x, self._layer_cfgs[f"{name}.skip_connection"],
                       padding="VALID") + h

    def _qk_matmul(self, ctx: QuantCtx, q: Array, k: Array, plan: dict) -> Array:
        """q, k: (B, T, H, c), already scaled by 1/sqrt(sqrt(c))."""
        site = f"{plan['name']}.attention.qkv_matmul"
        return ctx.act_matmul(site, "q", "k", "bthc,bshc->bhts", q, k,
                              self.policy.aq, self.policy.aq)

    def _smv_matmul(self, ctx: QuantCtx, w: Array, v: Array, plan: dict) -> Array:
        """w: (B, H, T, S) attention weights; v: (B, S, H, c)."""
        site = f"{plan['name']}.attention.smv_matmul"
        a = ctx.act_matmul(site, "sm", "v", "bhts,bshc->bthc", w, v,
                           self.policy.sm_aq_smv, self.policy.aq)
        return a.reshape(*a.shape[:2], -1)

    def _attnblock_qkv(self, p: dict, ctx: QuantCtx, xt: Array, name: str) -> Array:
        return qconv1d(ctx, f"{name}.qkv", _sub(p, f"{name}.qkv"), xt,
                       self._layer_cfgs[f"{name}.qkv"], padding="VALID")

    def _attnblock_proj(self, p: dict, ctx: QuantCtx, xt: Array, name: str) -> Array:
        return qconv1d(ctx, f"{name}.proj_out", _sub(p, f"{name}.proj_out"),
                       xt, self._layer_cfgs[f"{name}.proj_out"],
                       padding="VALID")

    def _attnblock(self, p: dict, ctx: QuantCtx, x: Array, plan: dict) -> Array:
        """Multi-head QKV self-attention (QKVAttentionLegacy semantics)."""
        name = plan["name"]
        b, hh, ww, c = x.shape
        heads = plan["heads"]
        ch = c // heads
        xt = x.reshape(b, hh * ww, c)
        sp = _sub(p, name)
        h = nn.group_norm(xt, sp["norm"]["scale"], sp["norm"]["bias"], eps=1e-5,
                          fused_ok=not ctx.differentiable)
        qkv = self._unit_call(ctx, f"{name}.qkv",
                              lambda h: self._attnblock_qkv(p, ctx, h, name), h) \
            if self.act_quant_partition else self._attnblock_qkv(p, ctx, h, name)
        t = qkv.shape[1]
        qkv = qkv.reshape(b, t, heads, 3 * ch)
        q, k, v = qkv[..., :ch], qkv[..., ch : 2 * ch], qkv[..., 2 * ch :]
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        qk = lambda q, k: self._qk_matmul(ctx, q * scale, k * scale, plan)
        if self.act_quant_partition:
            w = self._unit_call(ctx, f"{name}.attention.qkv_matmul", qk, q, k)
        elif self._use_blockwise(ctx, t):
            from qdiffusion_tpu.ops.attention import blockwise_attention

            qs = ctx.act_quant(name, "q", q * scale, self.policy.aq)
            ks = ctx.act_quant(name, "k", k * scale, self.policy.aq)
            sm_st = ctx.get_state(name, "sm")
            v_st = ctx.get_state(name, "v")
            act_on = ctx.mode.a
            a = blockwise_attention(
                qs, ks, v, scale=1.0,
                sm_q=(sm_st, self.policy.sm_aq_smv)
                if act_on and sm_st else None,
                v_q=(v_st, self.policy.aq) if act_on and v_st else None)
            a = a.reshape(b, t, heads * ch)
            h_out = self._attnblock_proj(p, ctx, a.astype(x.dtype), name)
            return (xt + h_out).reshape(b, hh, ww, c)
        else:
            site = name
            w = ctx.act_matmul(site, "q", "k", "bthc,bshc->bhts",
                               q * scale, k * scale,
                               self.policy.aq, self.policy.aq)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        if self.act_quant_partition:
            a = self._unit_call(
                ctx, f"{name}.attention.smv_matmul",
                lambda w, v: self._smv_matmul(ctx, w, v, plan), w, v)
        else:
            a = ctx.act_matmul(name, "sm", "v", "bhts,bshc->bthc", w, v,
                               self.policy.sm_aq_smv, self.policy.aq)
            a = a.reshape(b, t, heads * ch)
        a = a.astype(x.dtype)
        proj = lambda a: self._attnblock_proj(p, ctx, a, name)
        if self.act_quant_partition:
            h_out = self._unit_call(ctx, f"{name}.proj_out", proj, a)
        else:
            h_out = proj(a)
        return ((xt + h_out).reshape(b, hh, ww, c))

    def _cross_attention(self, p: dict, ctx: QuantCtx, x: Array,
                         context: Optional[Array], site: str, plan: dict) -> Array:
        """CrossAttention with the monkey-patched quantizer placement."""
        heads = plan["heads"]
        cfgq = self._layer_cfgs[f"{site}.to_q"]
        sp = _sub(p, site)
        q = qdense(ctx, f"{site}.to_q", sp["to_q"], x, cfgq)
        kv_in = x if context is None else context
        k = qdense(ctx, f"{site}.to_k", sp["to_k"], kv_in,
                   self._layer_cfgs[f"{site}.to_k"])
        v = qdense(ctx, f"{site}.to_v", sp["to_v"], kv_in,
                   self._layer_cfgs[f"{site}.to_v"])
        b, tq, inner = q.shape
        tk = k.shape[1]
        d = inner // heads
        q = q.reshape(b, tq, heads, d)
        k = k.reshape(b, tk, heads, d)
        v = v.reshape(b, tk, heads, d)
        scale = d ** -0.5
        if self._use_blockwise(ctx, tk):
            from qdiffusion_tpu.ops.attention import blockwise_attention

            qq = ctx.act_quant(site, "q", q, self.policy.aq)
            kq = ctx.act_quant(site, "k", k, self.policy.aq)
            sm_st = ctx.get_state(site, "sm")
            v_st = ctx.get_state(site, "v")
            act_on = ctx.mode.a
            out = blockwise_attention(
                qq, kq, v, scale=scale,
                sm_q=(sm_st, self.policy.sm_aq_transformer)
                if act_on and sm_st else None,
                v_q=(v_st, self.policy.aq) if act_on and v_st else None)
        else:
            sim = ctx.act_matmul(site, "q", "k", "bihd,bjhd->bhij", q, k,
                                 self.policy.aq, self.policy.aq) * scale
            attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
            out = ctx.act_matmul(site, "sm", "v", "bhij,bjhd->bihd", attn, v,
                                 self.policy.sm_aq_transformer,
                                 self.policy.aq).astype(x.dtype)
        out = out.reshape(b, tq, inner)
        return qdense(ctx, f"{site}.to_out.0", sp["to_out"]["0"], out,
                      self._layer_cfgs[f"{site}.to_out.0"])

    def _transformer_block(self, p: dict, ctx: QuantCtx, x: Array,
                           context: Optional[Array], plan: dict) -> Array:
        tb = plan["tb"]
        sp = _sub(p, tb)
        h = nn.layer_norm(x, sp["norm1"]["scale"], sp["norm1"]["bias"])
        x = self._cross_attention(p, ctx, h, None, f"{tb}.attn1", plan) + x
        h = nn.layer_norm(x, sp["norm2"]["scale"], sp["norm2"]["bias"])
        x = self._cross_attention(p, ctx, h, context, f"{tb}.attn2", plan) + x
        h = nn.layer_norm(x, sp["norm3"]["scale"], sp["norm3"]["bias"])
        ff = qdense(ctx, f"{tb}.ff.net.0.proj", sp["ff"]["net"]["0"]["proj"],
                    h, self._layer_cfgs[f"{tb}.ff.net.0.proj"])
        a, gate = jnp.split(ff, 2, axis=-1)
        ff = a * nn.gelu(gate)
        ff = qdense(ctx, f"{tb}.ff.net.2", sp["ff"]["net"]["2"], ff,
                    self._layer_cfgs[f"{tb}.ff.net.2"])
        return ff + x

    def _spatial_transformer(self, p: dict, ctx: QuantCtx, x: Array,
                             context: Optional[Array], plan: dict) -> Array:
        name = plan["name"]
        sp = _sub(p, name)
        b, hh, ww, c = x.shape
        x_in = x
        h = nn.group_norm(x, sp["norm"]["scale"], sp["norm"]["bias"],
                          fused_ok=not ctx.differentiable)
        h = self._unit_call(
            ctx, f"{name}.proj_in",
            lambda h: qconv2d(ctx, f"{name}.proj_in", sp["proj_in"], h,
                              self._layer_cfgs[f"{name}.proj_in"],
                              padding="VALID"), h)
        inner = h.shape[-1]
        h = h.reshape(b, hh * ww, inner)
        for d in range(plan["depth"]):
            tplan = dict(plan, tb=f"{name}.transformer_blocks.{d}")
            h = self._unit_call(
                ctx, f"{name}.transformer_blocks.{d}",
                (lambda tplan: lambda h, cctx: self._transformer_block(
                    p, ctx, h, cctx, tplan))(tplan), h, context)
        h = h.reshape(b, hh, ww, inner)
        h = self._unit_call(
            ctx, f"{name}.proj_out",
            lambda h: qconv2d(ctx, f"{name}.proj_out", sp["proj_out"], h,
                              self._layer_cfgs[f"{name}.proj_out"],
                              padding="VALID"), h)
        return h + x_in

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------

    def _run_unit(self, params, ctx, name, *inps):
        """Invoke a registered ReconUnit in the full forward, recording its
        (input, output) for capture — guarantees the captured tensors feed
        the exact same function the reconstruction loop optimizes."""
        unit = self._unit_map[name]
        return self._unit_call(
            ctx, name, lambda *i: unit.apply(params, ctx, *i), *inps)

    def _apply_entry(self, params, ctx, entry, h, emb, context):
        for item in entry:
            name = item["name"]
            if item["kind"] in ("conv", "upsample_conv"):
                h = self._run_unit(params, ctx, name, h)
            elif item["kind"] == "resblock":
                h = self._run_unit(params, ctx, name, h, emb)
            elif item["kind"] == "attnblock":
                # with the act-quant partition the inner qkv/matmul/proj
                # units capture themselves; otherwise the whole block is
                # one unit
                h = self._attnblock(params, ctx, h, item) \
                    if self.act_quant_partition else self._unit_call(
                        ctx, name,
                        (lambda item: lambda h: self._attnblock(
                            params, ctx, h, item))(item), h)
            elif item["kind"] == "transformer":
                h = self._spatial_transformer(params, ctx, h, context, item)
            else:
                raise ValueError(item["kind"])
        return h

    def apply(self, params: dict, x: Array, t: Array,
              ctx: Optional[QuantCtx] = None,
              context: Optional[Array] = None,
              y: Optional[Array] = None) -> Array:
        """Epsilon prediction. x: NHWC latents; t: (B,); context: (B, L, D);
        y: (B,) int class labels (class-conditional models)."""
        ctx = ctx or QuantCtx()
        cfg = self.cfg
        temb = nn.timestep_embedding(t, cfg.model_channels,
                                     fairseq=False).astype(x.dtype)
        emb = self._run_unit(params, ctx, "time_embed.0", temb)
        emb = nn.swish(emb)
        emb = self._run_unit(params, ctx, "time_embed.2", emb)
        if cfg.num_classes is not None:
            # label embedding added to the time embedding (reference
            # openaimodel.py:761-763); label_emb.w is (D, num_classes)
            # after the torch (N, D) Embedding transposes in torch_import
            if y is None:
                raise ValueError("class-conditional model needs y labels")
            emb = emb + jnp.take(params["label_emb"]["w"], y,
                                 axis=1).T.astype(emb.dtype)

        hs = []
        h = x
        for entry in self.input_plan:
            h = self._apply_entry(params, ctx, entry, h, emb, context)
            hs.append(h)
        for item in self.middle_plan:
            h = self._apply_entry(params, ctx, [item], h, emb, context)
        for entry in self.output_plan:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_entry(params, ctx, entry, h, emb, context)
        h = nn.group_norm_swish(h, params["out"]["0"]["scale"],
                                params["out"]["0"]["bias"], eps=1e-5,
                                fused_ok=not ctx.differentiable)
        return self._run_unit(params, ctx, "out.2", h)

    # ------------------------------------------------------------------
    # random init (tests; real weights via torch_import)
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(rng, 8192))

        def conv(cin, cout, k, zero=False):
            if zero:
                w = jnp.zeros((k, k, cin, cout), dtype)
            else:
                w = jax.random.normal(next(keys), (k, k, cin, cout), dtype) \
                    / np.sqrt(k * k * cin)
            return {"w": w, "b": jnp.zeros((cout,), dtype)}

        def conv1(cin, cout, zero=False):  # conv1d k=1, LIO
            if zero:
                w = jnp.zeros((1, cin, cout), dtype)
            else:
                w = jax.random.normal(next(keys), (1, cin, cout), dtype) \
                    / np.sqrt(cin)
            return {"w": w, "b": jnp.zeros((cout,), dtype)}

        def lin(cin, cout, bias=True):
            p = {"w": jax.random.normal(next(keys), (cin, cout), dtype)
                 / np.sqrt(cin)}
            if bias:
                p["b"] = jnp.zeros((cout,), dtype)
            return p

        def norm(c):
            return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def resblock(plan):
            emb_out = (2 * plan["out_ch"] if plan["scale_shift"]
                       else plan["out_ch"])
            d = {
                "in_layers": {"0": norm(plan["in_ch"]),
                              "2": conv(plan["in_ch"], plan["out_ch"], 3)},
                "emb_layers": {"1": lin(cfg.time_embed_dim, emb_out)},
                "out_layers": {"0": norm(plan["out_ch"]),
                               "3": conv(plan["out_ch"], plan["out_ch"], 3,
                                         zero=True)},
            }
            if plan["skip"] != "identity":
                d["skip_connection"] = conv(plan["in_ch"], plan["out_ch"], 1)
            return d

        def attnblock(plan):
            c = plan["ch"]
            return {"norm": norm(c), "qkv": conv1(c, 3 * c),
                    "proj_out": conv1(c, c, zero=True)}

        def transformer(plan):
            inner, c = plan["inner"], plan["ch"]
            ctx_dim = plan["context_dim"] or inner
            def cross(kv_dim):
                return {"to_q": lin(inner, inner, bias=False),
                        "to_k": lin(kv_dim, inner, bias=False),
                        "to_v": lin(kv_dim, inner, bias=False),
                        "to_out": {"0": lin(inner, inner)}}
            blocks = {}
            for d in range(plan["depth"]):
                blocks[str(d)] = {
                    "attn1": cross(inner),
                    "attn2": cross(ctx_dim),
                    "ff": {"net": {"0": {"proj": lin(inner, inner * 8)},
                                   "2": lin(inner * 4, inner)}},
                    "norm1": norm(inner), "norm2": norm(inner),
                    "norm3": norm(inner),
                }
            return {"norm": norm(c), "proj_in": conv(c, inner, 1),
                    "transformer_blocks": blocks,
                    "proj_out": conv(inner, c, 1, zero=True)}

        def build_entry(entry):
            out = {}
            for item in entry:
                j = item["name"].split(".")[-1] if item["kind"] in (
                    "conv",) else item["name"].split(".")[-1]
                if item["kind"] == "conv":
                    parts = item["name"].split(".")
                    # input_blocks.N.0 or input_blocks.N.0.op
                    if parts[-1] == "op":
                        out["0"] = {"op": conv(
                            self._conv_io(item["name"])[0],
                            self._conv_io(item["name"])[1], 3)}
                    else:
                        out[parts[-1]] = conv(
                            self._conv_io(item["name"])[0],
                            self._conv_io(item["name"])[1], 3)
                elif item["kind"] == "upsample_conv":
                    parts = item["name"].split(".")
                    out[parts[-2]] = {"conv": conv(
                        self._conv_io(item["name"])[0],
                        self._conv_io(item["name"])[1], 3)}
                elif item["kind"] == "resblock":
                    out[item["name"].split(".")[-1]] = resblock(item)
                elif item["kind"] == "attnblock":
                    out[item["name"].split(".")[-1]] = attnblock(item)
                elif item["kind"] == "transformer":
                    out[item["name"].split(".")[-1]] = transformer(item)
            return out

        # conv io sizes are recorded at registration time
        params = {
            "time_embed": {"0": lin(cfg.model_channels, cfg.time_embed_dim),
                           "2": lin(cfg.time_embed_dim, cfg.time_embed_dim)},
            "input_blocks": {}, "middle_block": {}, "output_blocks": {},
            "out": {"0": norm(self.out_ch_in),
                    "2": conv(cfg.model_channels, cfg.out_channels, 3,
                              zero=True)},
        }
        if cfg.num_classes is not None:
            params["label_emb"] = {"w": jax.random.normal(
                next(keys), (cfg.time_embed_dim, cfg.num_classes), dtype)}
        for i, entry in enumerate(self.input_plan):
            params["input_blocks"][str(i)] = build_entry(entry)
        mid = build_entry(self.middle_plan)
        params["middle_block"] = mid
        for i, entry in enumerate(self.output_plan):
            params["output_blocks"][str(i)] = build_entry(entry)
        return params

    def _conv_io(self, name: str) -> Tuple[int, int]:
        return self._conv_sizes[name]
