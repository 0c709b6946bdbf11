"""Convert torch state_dicts to qdiffusion_tpu parameter pytrees.

Layout conversion: Conv2d OIHW -> HWIO, Conv1d OIL -> LIO wait no — torch
Conv1d weight is (O, I, L) -> (L, I, O); Linear (out, in) -> (in, out);
norm weight/bias -> scale/bias. Tree structure mirrors the dotted torch
names, so `down.0.block.0.conv1.weight` lands at
params['down']['0']['block']['0']['conv1']['w'].

Works on plain numpy arrays so torch is only required at conversion time.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["state_dict_to_pytree"]

_NORM_MARKERS = ("norm", "ln_", "layernorm", "ln1", "ln2")


def _assign(tree: dict, dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def state_dict_to_pytree(sd: Dict[str, "np.ndarray"], dtype=np.float32) -> dict:
    """sd: name -> array (torch tensors or numpy)."""
    arrays = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        arrays[k] = np.asarray(v)

    ndims = {k: a.ndim for k, a in arrays.items()}
    tree: dict = {}
    for k, a in arrays.items():
        a = a.astype(dtype)
        if k.endswith(".weight"):
            base = k[: -len(".weight")]
            if a.ndim == 4:  # conv2d OIHW -> HWIO
                _assign(tree, base + ".w", np.transpose(a, (2, 3, 1, 0)))
            elif a.ndim == 3:  # conv1d OIL -> LIO
                _assign(tree, base + ".w", np.transpose(a, (2, 1, 0)))
            elif a.ndim == 2:  # linear (out,in) -> (in,out)
                _assign(tree, base + ".w", np.transpose(a))
            else:  # norm scale
                _assign(tree, base + ".scale", a)
        elif k.endswith(".bias"):
            base = k[: -len(".bias")]
            wkey = base + ".weight"
            if ndims.get(wkey, 1) == 1:  # norm bias
                _assign(tree, base + ".bias", a)
            else:
                _assign(tree, base + ".b", a)
        else:
            _assign(tree, k, a)
    return tree
