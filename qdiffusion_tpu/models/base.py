"""Shared machinery for quantizable functional models.

Each model subclass registers, at construction time:
  * per-layer LayerQuantConfig (static bits/split/axes) keyed by the layer's
    torch-state_dict-style dotted name, and
  * an ordered list of ReconUnit descriptors — the reconstruction targets
    that mirror the reference's named_children DFS over QuantModules and
    BaseQuantBlocks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List

from qdiffusion_tpu.ops.qlayers import LayerQuantConfig
from qdiffusion_tpu.quant.context import QuantCtx


@dataclasses.dataclass
class ReconUnit:
    """One reconstruction target: a leaf layer or a structural block."""

    name: str
    kind: str  # 'layer' | 'resnet' | 'attn' | 'resblock' | 'attnblock' |
    #            'transformer' | 'qkmatmul' | 'smvmatmul'
    apply: Callable  # standalone forward: (params, ctx, *inputs) -> out
    layer_names: List[str]  # quantizable conv/linear sites inside
    takes_temb: bool = False
    loss_axis: int = -1  # axis summed by the reconstruction Lp loss
    #                      (reference lp_loss dim=1 in NCHW terms)
    extra_sites: List[str] = dataclasses.field(default_factory=list)
    # block-level act-quant site names beyond unit.name (e.g. the attn1/
    # attn2 quantizers of a transformer block)


def _sub(params: dict, dotted: str) -> Any:
    node: Any = params
    for part in dotted.split("."):
        node = node[part]
    return node


class QuantModelBase:
    """Base: quant-site registry + unit bookkeeping."""

    def __init__(self):
        self._layer_cfgs: Dict[str, LayerQuantConfig] = {}
        self._units: List[ReconUnit] = []

    def _lcfg(self, name: str, split: int = 0, in_axis: int = 2,
              disable_act_quant: bool = False) -> LayerQuantConfig:
        cfg = LayerQuantConfig(wq=self.policy.wq, aq=self.policy.aq,
                               split=split, in_axis=in_axis,
                               disable_act_quant=disable_act_quant)
        self._layer_cfgs[name] = cfg
        return cfg

    def _unit_call(self, ctx: QuantCtx, name: str, fn: Callable, *inps):
        if name in ctx.substitute:
            # output override for block-gradient computation; the unit's
            # own compute becomes dead code
            return ctx.substitute[name]
        out = fn(*inps)
        ctx.capture_io(name, inps if len(inps) > 1 else inps[0], out)
        return out

    @property
    def units(self) -> List[ReconUnit]:
        return list(self._units)

    def layer_cfg(self, name: str) -> LayerQuantConfig:
        return self._layer_cfgs[name]

    @property
    def layer_cfgs(self) -> Dict[str, LayerQuantConfig]:
        return dict(self._layer_cfgs)
