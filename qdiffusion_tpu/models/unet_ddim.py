"""Pixel-space DDPM UNet (CIFAR-10 / LSUN lineage), TPU-native.

Functional re-design of the reference architecture
(ddim/models/diffusion.py:199-360): NHWC activations, HWIO weights, pure
forward over a params pytree, quantization via QuantCtx sites instead of
module surgery. Parameter tree keys mirror the torch state_dict names so
checkpoint conversion is mechanical (models/torch_import.py).

Calibration hooks:
  * every conv/linear is a quant site named by its torch path;
  * each ResnetBlock / AttnBlock is a registered reconstruction unit with a
    standalone `apply` (replaces the reference's forward-hook +
    StopForwardException capture, qdiff/utils.py:186-255 — under jit, XLA
    dead-code-eliminates everything past the captured block);
  * split-shortcut points are static per layer: in the up path the skip
    concat boundary is always the channel count flowing up
    (reference diffusion.py:338-349), so `split` is resolved at construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qdiffusion_tpu import nn
from qdiffusion_tpu.ops.qlayers import qconv2d, qdense
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import QuantCtx

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DDIMUNetConfig:
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resolution: int = 32
    resamp_with_conv: bool = True
    split_shortcut: bool = False

    @property
    def temb_ch(self) -> int:
        return self.ch * 4


@dataclasses.dataclass(frozen=True)
class QuantPolicy:
    """Model-wide quantizer specs (reference wq_params/aq_params +
    sm_abit, scripts/sample_diffusion_ddim.py:129-139)."""

    wq: AffineQuantizerSpec = AffineQuantizerSpec(
        n_bits=8, channel_wise=True, channel_axis=-1, scale_method="max")
    aq: AffineQuantizerSpec = AffineQuantizerSpec(
        n_bits=8, symmetric=False, channel_wise=False, scale_method="max",
        leaf_param=True)
    sm_abit: int = 8

    @property
    def sm_aq(self) -> AffineQuantizerSpec:
        # post-softmax attention weights: sm_abit bits (quant_block.py:349-351)
        return self.aq.replace(n_bits=self.sm_abit)


from qdiffusion_tpu.models.base import QuantModelBase, ReconUnit, _sub  # noqa: E402


class DDIMUNet(QuantModelBase):
    """CIFAR/LSUN pixel-space epsilon-prediction UNet."""

    def __init__(self, config: DDIMUNetConfig, policy: Optional[QuantPolicy] = None):
        super().__init__()
        self.cfg = config
        self.policy = policy or QuantPolicy()
        self._build()

    # ------------------------------------------------------------------
    # static structure
    # ------------------------------------------------------------------

    def _build(self):
        cfg = self.cfg
        self.num_resolutions = len(cfg.ch_mult)
        in_ch_mult = (1,) + tuple(cfg.ch_mult)

        # resolve static channel plan (mirrors reference constructor
        # diffusion.py:238-298) and register quant sites + recon units.
        self._lcfg("temb.dense.0", in_axis=0)
        self._lcfg("temb.dense.1", in_axis=0)
        self._lcfg("conv_in")
        self._units.append(ReconUnit(
            "temb.dense.0", "layer",
            lambda p, ctx, x: qdense(ctx, "temb.dense.0", _sub(p, "temb.dense.0"),
                                     x, self._layer_cfgs["temb.dense.0"]),
            ["temb.dense.0"]))
        self._units.append(ReconUnit(
            "temb.dense.1", "layer",
            lambda p, ctx, x: qdense(ctx, "temb.dense.1", _sub(p, "temb.dense.1"),
                                     x, self._layer_cfgs["temb.dense.1"]),
            ["temb.dense.1"]))
        self._units.append(ReconUnit(
            "conv_in", "layer",
            lambda p, ctx, x: qconv2d(ctx, "conv_in", _sub(p, "conv_in"), x,
                                      self._layer_cfgs["conv_in"], padding=1),
            ["conv_in"]))

        self.down_plan = []  # per level: dict(blocks=[(in,out,split)], attn, down)
        curr_res = cfg.resolution
        block_in = 0
        for i in range(self.num_resolutions):
            blocks = []
            block_in = cfg.ch * in_ch_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            has_attn = curr_res in cfg.attn_resolutions
            for j in range(cfg.num_res_blocks):
                name = f"down.{i}.block.{j}"
                blocks.append(self._register_resnet(name, block_in, block_out, 0))
                block_in = block_out
                if has_attn:
                    self._register_attn(f"down.{i}.attn.{j}", block_in)
            downsample = i != self.num_resolutions - 1
            if downsample and cfg.resamp_with_conv:
                self._lcfg(f"down.{i}.downsample.conv")
                nm = f"down.{i}.downsample.conv"
                self._units.append(ReconUnit(
                    nm, "layer",
                    (lambda nm: lambda p, ctx, x: qconv2d(
                        ctx, nm, _sub(p, nm), x, self._layer_cfgs[nm],
                        stride=2, padding="VALID"))(nm),
                    [nm]))
            if downsample:
                curr_res //= 2
            self.down_plan.append(dict(blocks=blocks, attn=has_attn,
                                       down=downsample))

        self.mid_in = block_in
        self._register_resnet("mid.block_1", block_in, block_in, 0)
        self._register_attn("mid.attn_1", block_in)
        self._register_resnet("mid.block_2", block_in, block_in, 0)

        self.up_plan = [None] * self.num_resolutions
        for i in reversed(range(self.num_resolutions)):
            blocks = []
            block_out = cfg.ch * cfg.ch_mult[i]
            skip_in = cfg.ch * cfg.ch_mult[i]
            has_attn = curr_res in cfg.attn_resolutions
            for j in range(cfg.num_res_blocks + 1):
                if j == cfg.num_res_blocks:
                    skip_in = cfg.ch * in_ch_mult[i]
                # split point == channels flowing up (reference
                # diffusion.py:340-346: split_ = h.size(1))
                split = block_in if (cfg.split_shortcut and i < 4) else 0
                name = f"up.{i}.block.{j}"
                blocks.append(self._register_resnet(
                    name, block_in + skip_in, block_out, split))
                block_in = block_out
                if has_attn:
                    self._register_attn(f"up.{i}.attn.{j}", block_in)
            upsample = i != 0
            if upsample and cfg.resamp_with_conv:
                nm = f"up.{i}.upsample.conv"
                self._lcfg(nm)
                self._units.append(ReconUnit(
                    nm, "layer",
                    (lambda nm: lambda p, ctx, x: qconv2d(
                        ctx, nm, _sub(p, nm), x, self._layer_cfgs[nm],
                        padding=1))(nm),
                    [nm]))
            if upsample:
                curr_res *= 2
            self.up_plan[i] = dict(blocks=blocks, attn=has_attn, up=upsample)

        self._lcfg("conv_out")
        self._units.append(ReconUnit(
            "conv_out", "layer",
            lambda p, ctx, x: qconv2d(ctx, "conv_out", _sub(p, "conv_out"), x,
                                      self._layer_cfgs["conv_out"], padding=1),
            ["conv_out"]))
        self.out_ch_in = block_in

        # Reconstruction order must match the reference named_children DFS:
        # temb, conv_in, then per down/up level all `block`s, then all
        # `attn`s, then the resample conv (module *definition* order, not
        # execution order), mid in definition order, conv_out last.
        by_name = {u.name: u for u in self._units}
        kind_rank = {"block": 0, "attn": 1, "downsample": 2, "upsample": 2}

        def level_key(n: str):
            parts = n.split(".")
            return (int(parts[1]), kind_rank[parts[2]],
                    int(parts[3]) if parts[3].isdigit() else 0)

        down_names = sorted([n for n in by_name if n.startswith("down.")],
                            key=level_key)
        up_names = sorted([n for n in by_name if n.startswith("up.")],
                          key=level_key)
        order = (["temb.dense.0", "temb.dense.1", "conv_in"] + down_names
                 + ["mid.block_1", "mid.attn_1", "mid.block_2"] + up_names
                 + ["conv_out"])
        self._units = [by_name[n] for n in order]

    def _register_resnet(self, name: str, in_ch: int, out_ch: int, split: int):
        plan = dict(name=name, in_ch=in_ch, out_ch=out_ch, split=split)
        self._lcfg(f"{name}.conv1")
        self._lcfg(f"{name}.temb_proj")
        self._lcfg(f"{name}.conv2")
        layers = [f"{name}.conv1", f"{name}.temb_proj", f"{name}.conv2"]
        if in_ch != out_ch:
            self._lcfg(f"{name}.nin_shortcut", split=split)
            layers.append(f"{name}.nin_shortcut")
        self._units.append(ReconUnit(
            name, "resnet",
            (lambda plan: lambda p, ctx, x, temb: self._resnet(
                _sub(p, plan["name"]), ctx, x, temb, plan))(plan),
            layers, takes_temb=True))
        return plan

    def _register_attn(self, name: str, ch: int):
        plan = dict(name=name, ch=ch)
        for leaf in ("q", "k", "v", "proj_out"):
            self._lcfg(f"{name}.{leaf}")
        self._units.append(ReconUnit(
            name, "attn",
            (lambda plan: lambda p, ctx, x: self._attn(
                _sub(p, plan["name"]), ctx, x, plan))(plan),
            [f"{name}.{leaf}" for leaf in ("q", "k", "v", "proj_out")]))
        return plan

    # ------------------------------------------------------------------
    # forward pieces
    # ------------------------------------------------------------------

    def _resnet(self, p: dict, ctx: QuantCtx, x: Array, temb: Array,
                plan: dict) -> Array:
        """ResnetBlock (reference diffusion.py:77-141). Dropout is identity
        at inference."""
        name = plan["name"]
        h = nn.group_norm_swish(x, p["norm1"]["scale"], p["norm1"]["bias"],
                                fused_ok=not ctx.differentiable)
        h = qconv2d(ctx, f"{name}.conv1", p["conv1"], h,
                    self._layer_cfgs[f"{name}.conv1"], padding=1)
        t = qdense(ctx, f"{name}.temb_proj", p["temb_proj"], nn.swish(temb),
                   self._layer_cfgs[f"{name}.temb_proj"])
        h = h + t[:, None, None, :]
        h = nn.group_norm_swish(h, p["norm2"]["scale"], p["norm2"]["bias"],
                                fused_ok=not ctx.differentiable)
        h = qconv2d(ctx, f"{name}.conv2", p["conv2"], h,
                    self._layer_cfgs[f"{name}.conv2"], padding=1)
        if plan["in_ch"] != plan["out_ch"]:
            x = qconv2d(ctx, f"{name}.nin_shortcut", p["nin_shortcut"], x,
                        self._layer_cfgs[f"{name}.nin_shortcut"], padding="VALID")
        return x + h

    def _attn(self, p: dict, ctx: QuantCtx, x: Array, plan: dict) -> Array:
        """Single-head spatial self-attention (reference diffusion.py:144-196
        + QuantAttnBlock quantizer placement, quant_block.py:333-386):
        q/k quantized before QK^T, softmax in fp32, post-softmax weights at
        sm_abit with v at act bits before AV."""
        name = plan["name"]
        h = nn.group_norm(x, p["norm"]["scale"], p["norm"]["bias"],
                          fused_ok=not ctx.differentiable)
        q = qconv2d(ctx, f"{name}.q", p["q"], h,
                    self._layer_cfgs[f"{name}.q"], padding="VALID")
        k = qconv2d(ctx, f"{name}.k", p["k"], h,
                    self._layer_cfgs[f"{name}.k"], padding="VALID")
        v = qconv2d(ctx, f"{name}.v", p["v"], h,
                    self._layer_cfgs[f"{name}.v"], padding="VALID")
        b, hh, ww, c = q.shape
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = ctx.act_matmul(name, "q", "k", "bic,bjc->bij", q, k,
                           self.policy.aq, self.policy.aq)
        w = w * (int(c) ** -0.5)
        w = jax.nn.softmax(w, axis=2)
        hout = ctx.act_matmul(name, "sm", "v", "bij,bjc->bic",
                              w.astype(x.dtype), v, self.policy.sm_aq,
                              self.policy.aq).astype(x.dtype)
        hout = hout.reshape(b, hh, ww, c)
        hout = qconv2d(ctx, f"{name}.proj_out", p["proj_out"], hout,
                       self._layer_cfgs[f"{name}.proj_out"], padding="VALID")
        return x + hout

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------

    def apply(self, params: dict, x: Array, t: Array,
              ctx: Optional[QuantCtx] = None) -> Array:
        """Epsilon prediction. x: NHWC; t: (B,) int/float timesteps."""
        ctx = ctx or QuantCtx()
        cfg = self.cfg
        u = self._unit_apply_map(params, ctx)

        temb = nn.timestep_embedding(t, cfg.ch).astype(x.dtype)
        temb = self._unit_call(ctx, "temb.dense.0", u["temb.dense.0"], temb)
        temb = nn.swish(temb)
        temb = self._unit_call(ctx, "temb.dense.1", u["temb.dense.1"], temb)

        hs = [self._unit_call(ctx, "conv_in", u["conv_in"], x)]
        for i, lvl in enumerate(self.down_plan):
            for j in range(cfg.num_res_blocks):
                h = self._unit_call(ctx, f"down.{i}.block.{j}",
                                    u[f"down.{i}.block.{j}"], hs[-1], temb)
                if lvl["attn"]:
                    h = self._unit_call(ctx, f"down.{i}.attn.{j}",
                                        u[f"down.{i}.attn.{j}"], h)
                hs.append(h)
            if lvl["down"]:
                if cfg.resamp_with_conv:
                    nm = f"down.{i}.downsample.conv"
                    hpad = nn.pad_asymmetric_downsample(hs[-1])
                    hs.append(self._unit_call(ctx, nm, u[nm], hpad))
                else:
                    hs.append(nn.avg_pool_2x(hs[-1]))

        h = hs[-1]
        h = self._unit_call(ctx, "mid.block_1", u["mid.block_1"], h, temb)
        h = self._unit_call(ctx, "mid.attn_1", u["mid.attn_1"], h)
        h = self._unit_call(ctx, "mid.block_2", u["mid.block_2"], h, temb)

        for i in reversed(range(self.num_resolutions)):
            lvl = self.up_plan[i]
            for j in range(cfg.num_res_blocks + 1):
                hcat = jnp.concatenate([h, hs.pop()], axis=-1)
                h = self._unit_call(ctx, f"up.{i}.block.{j}",
                                    u[f"up.{i}.block.{j}"], hcat, temb)
                if lvl["attn"]:
                    h = self._unit_call(ctx, f"up.{i}.attn.{j}",
                                        u[f"up.{i}.attn.{j}"], h)
            if lvl["up"]:
                h = nn.upsample_nearest_2x(h)
                if cfg.resamp_with_conv:
                    nm = f"up.{i}.upsample.conv"
                    h = self._unit_call(ctx, nm, u[nm], h)

        h = nn.group_norm_swish(h, params["norm_out"]["scale"],
                                params["norm_out"]["bias"],
                                fused_ok=not ctx.differentiable)
        h = self._unit_call(ctx, "conv_out", u["conv_out"], h)
        return h

    def _unit_apply_map(self, params, ctx):
        return {unit.name: (lambda unit: lambda *inps: unit.apply(
            params, ctx, *inps))(unit) for unit in self._units}

    # ------------------------------------------------------------------
    # parameter init (for tests; real weights come from torch_import)
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(rng, 4096))

        def conv(cin, cout, k):
            fan = k * k * cin
            return {
                "w": jax.random.normal(next(keys), (k, k, cin, cout), dtype)
                / np.sqrt(fan),
                "b": jnp.zeros((cout,), dtype),
            }

        def lin(cin, cout):
            return {
                "w": jax.random.normal(next(keys), (cin, cout), dtype)
                / np.sqrt(cin),
                "b": jnp.zeros((cout,), dtype),
            }

        def norm(c):
            return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def resnet(plan):
            p = {
                "norm1": norm(plan["in_ch"]),
                "conv1": conv(plan["in_ch"], plan["out_ch"], 3),
                "temb_proj": lin(cfg.temb_ch, plan["out_ch"]),
                "norm2": norm(plan["out_ch"]),
                "conv2": conv(plan["out_ch"], plan["out_ch"], 3),
            }
            if plan["in_ch"] != plan["out_ch"]:
                p["nin_shortcut"] = conv(plan["in_ch"], plan["out_ch"], 1)
            return p

        def attn(ch):
            return {
                "norm": norm(ch),
                "q": conv(ch, ch, 1),
                "k": conv(ch, ch, 1),
                "v": conv(ch, ch, 1),
                "proj_out": conv(ch, ch, 1),
            }

        params: dict = {
            "temb": {"dense": {"0": lin(cfg.ch, cfg.temb_ch),
                               "1": lin(cfg.temb_ch, cfg.temb_ch)}},
            "conv_in": conv(cfg.in_channels, cfg.ch, 3),
            "down": {}, "mid": {}, "up": {},
        }
        for i, lvl in enumerate(self.down_plan):
            d: dict = {"block": {}}
            if lvl["attn"]:
                d["attn"] = {}
            for j, plan in enumerate(lvl["blocks"]):
                d["block"][str(j)] = resnet(plan)
                if lvl["attn"]:
                    d["attn"][str(j)] = attn(plan["out_ch"])
            if lvl["down"] and cfg.resamp_with_conv:
                cin = lvl["blocks"][-1]["out_ch"]
                d["downsample"] = {"conv": conv(cin, cin, 3)}
            params["down"][str(i)] = d
        params["mid"] = {
            "block_1": resnet(dict(name="", in_ch=self.mid_in,
                                   out_ch=self.mid_in, split=0)),
            "attn_1": attn(self.mid_in),
            "block_2": resnet(dict(name="", in_ch=self.mid_in,
                                   out_ch=self.mid_in, split=0)),
        }
        for i in range(self.num_resolutions):
            lvl = self.up_plan[i]
            d = {"block": {}}
            if lvl["attn"]:
                d["attn"] = {}
            for j, plan in enumerate(lvl["blocks"]):
                d["block"][str(j)] = resnet(plan)
                if lvl["attn"]:
                    d["attn"][str(j)] = attn(plan["out_ch"])
            if lvl["up"] and cfg.resamp_with_conv:
                cin = lvl["blocks"][-1]["out_ch"]
                d["upsample"] = {"conv": conv(cin, cin, 3)}
            params["up"][str(i)] = d
        params["norm_out"] = norm(self.out_ch_in)
        params["conv_out"] = conv(self.out_ch_in, cfg.out_ch, 3)
        return params


