"""Tensor parallelism for the LDM/SD UNet over a ("data", "model") mesh.

The reference is strictly single-GPU (SURVEY.md §2.5: no sharded layers
anywhere). On TPU, tensor parallelism is expressed as PartitionSpecs on
the parameter pytree over a 2-axis mesh; XLA GSPMD propagates the
shardings through the (unchanged) pure-function forward and inserts the
ICI collectives. No model code changes — the megatron-style layout falls
out of the specs alone:

  * cross-attention ``to_q/to_k/to_v`` — column-parallel (output features
    sharded on ``model``). The head reshape ``(B, T, inner) -> (B, T,
    heads, d)`` keeps heads sharded because the spec is only applied when
    ``heads % model_size == 0`` (each device holds whole heads).
  * ``to_out.0`` — row-parallel (input features sharded); the summed
    partial products become one psum over ``model``, bias replicated.
  * GEGLU feed-forward: ``ff.net.0.proj`` column-parallel (its bias
    sharded alike), ``ff.net.2`` row-parallel. The GEGLU halves-split on
    the fused (2·inner) dim crosses shard boundaries; GSPMD reshards
    the two (B, T, inner) halves — measured one extra collective per
    block, still a net win at SD widths where FF dominates.
  * AttentionBlock (the non-transformer LDM attention): the fused
    ``qkv`` 1x1 conv's output dim is head-major ``(heads, 3·ch)``, so
    column-sharding it shards whole heads with their q/k/v triplets
    intact; ``proj_out`` is row-parallel.
  * Convolutions, norms, time embedding: replicated (the UNet is
    conv-bound at small widths; TP targets the dense/attention-heavy SD
    shapes — see docs/PERF_NOTES.md).

Quantizer state rides along replicated: fake-quant is elementwise on the
weight, so GSPMD slices the per-channel delta/zero-point vectors to match
the sharded weight operand automatically.

Composes with data parallelism: batch on ``data``, params on ``model``
(``P()``-over-data means each data row holds a full model replica).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qdiffusion_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_tp_mesh(data: int, model: int,
                 axes=(DATA_AXIS, MODEL_AXIS)) -> Mesh:
    """(data, model) 2-axis mesh. TP traffic (psum per row-parallel layer)
    rides the fast inner axis; keep ``model`` innermost so its devices are
    ICI neighbours (scaling-book layout)."""
    devs = jax.devices()
    if data * model > len(devs):
        raise ValueError(f"mesh {data}x{model} > {len(devs)} devices")
    return Mesh(np.array(devs[: data * model]).reshape(data, model), axes)


def _divisible(shape, axis: int, n: int) -> bool:
    return shape[axis] % n == 0


def tp_param_specs(model, params: dict, model_size: int,
                   model_axis: str = MODEL_AXIS) -> dict:
    """PartitionSpec pytree (same structure as ``params``) sharding the
    LDM/SD UNet megatron-style over ``model_axis``; everything the rules
    don't cover is replicated. ``model`` is the LDMUNet instance (its
    ``_plans`` registry supplies per-site head counts for the
    whole-heads-per-device gate)."""
    special: dict[str, P] = {}

    def col(path, w, axis=-1):  # column-parallel: output features sharded
        if _divisible(w.shape, w.ndim - 1 if axis == -1 else axis, model_size):
            spec = [None] * w.ndim
            spec[axis] = model_axis
            special[path] = P(*spec)

    def row(path, w, axis):  # row-parallel: input features sharded
        if _divisible(w.shape, axis, model_size):
            spec = [None] * w.ndim
            spec[axis] = model_axis
            special[path] = P(*spec)

    flat = {
        ".".join(str(k.key) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    }

    for plan in model._plans.values():
        kind = plan.get("kind")
        if kind == "transformer":
            if plan["heads"] % model_size:
                continue
            for d in range(plan["depth"]):
                tb = f"{plan['name']}.transformer_blocks.{d}"
                for attn in ("attn1", "attn2"):
                    for qkv in ("to_q", "to_k", "to_v"):
                        pth = f"{tb}.{attn}.{qkv}.w"
                        col(pth, flat[pth])
                    pth = f"{tb}.{attn}.to_out.0.w"
                    row(pth, flat[pth], 0)
                pth = f"{tb}.ff.net.0.proj.w"
                col(pth, flat[pth])
                bp = f"{tb}.ff.net.0.proj.b"
                if bp in flat and _divisible(flat[bp].shape, 0, model_size):
                    special[bp] = P(model_axis)
                pth = f"{tb}.ff.net.2.w"
                row(pth, flat[pth], 0)
        elif kind == "attnblock":
            if plan["heads"] % model_size:
                continue
            name = plan["name"]
            if f"{name}.qkv.w" not in flat:
                continue
            col(f"{name}.qkv.w", flat[f"{name}.qkv.w"])  # (1, C, 3C) LIO
            bp = f"{name}.qkv.b"
            if bp in flat and _divisible(flat[bp].shape, 0, model_size):
                special[bp] = P(model_axis)
            row(f"{name}.proj_out.w", flat[f"{name}.proj_out.w"], 1)

    def spec_for(path, leaf):
        return special.get(
            ".".join(str(k.key) for k in path), P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(params: dict, mesh: Mesh, specs: dict) -> dict:
    """Place the param pytree on the mesh per the TP specs (replicated
    over every non-model axis)."""
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs)


def tp_sharding_tree(mesh: Mesh, specs: dict):
    """NamedSharding pytree from a spec pytree (for jit in_shardings)."""
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def count_sharded(specs: dict) -> int:
    """Number of param leaves the spec tree actually shards."""
    return sum(s != P()
               for s in jax.tree_util.tree_leaves(
                   specs, is_leaf=lambda x: isinstance(x, P)))
