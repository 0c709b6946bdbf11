"""InceptionV3 pool3 feature extractor for FID, TPU-native.

JAX port of the de-facto-standard FID Inception network — the pytorch-fid /
torch-fidelity port of the TF-2015 InceptionV3 graph that the reference
ecosystem scores with (reference README.md:103 evaluates via
torch-fidelity). Architecture follows pytorch_fid/inception.py exactly,
including its three FID-specific deviations from stock torchvision:

  * InceptionA/C and Mixed_7b (E_1): branch_pool uses
    avg_pool(3, stride 1, pad 1, count_include_pad=False);
  * Mixed_7c (E_2): branch_pool uses max_pool(3, stride 1, pad 1);
  * the unused aux classifier is dropped.

Weights are an external artifact (`pt_inception-2015-12-05-6726825d.pth`,
the file pytorch-fid auto-downloads); `convert_pt_inception` ingests its
state_dict, folding every BatchNorm (eps=1e-3) into the preceding conv —
inference-only, so the folded form is exact and TPU-friendly (one conv op
per BasicConv2d instead of conv+BN).

Feature extraction runs jitted on TPU: scoring 50k samples is a few
seconds of device time instead of the reference's minutes of host torch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv(p: dict, x: Array, stride=(1, 1), padding=((0, 0), (0, 0))) -> Array:
    y = jax.lax.conv_general_dilated(
        x, p["w"], stride, list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["b"])


def _max_pool(x: Array, k: int, stride: int, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool_nocountpad(x: Array, k: int = 3) -> Array:
    """avg_pool(k, stride 1, pad 1, count_include_pad=False) — the divisor
    at each position counts only in-bounds elements (torch semantics used
    by the FID blocks)."""
    dims, strides = (1, k, k, 1), (1, 1, 1, 1)
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return s / cnt


def _p(pad_h: int, pad_w: Optional[int] = None):
    pad_w = pad_h if pad_w is None else pad_w
    return ((pad_h, pad_h), (pad_w, pad_w))


# ---------------------------------------------------------------------------
# blocks (pytorch_fid/inception.py + torchvision inception.py structure)
# ---------------------------------------------------------------------------


def _inception_a(p: dict, x: Array) -> Array:
    b1 = _conv(p["branch1x1"], x)
    b5 = _conv(p["branch5x5_1"], x)
    b5 = _conv(p["branch5x5_2"], b5, padding=_p(2))
    b3 = _conv(p["branch3x3dbl_1"], x)
    b3 = _conv(p["branch3x3dbl_2"], b3, padding=_p(1))
    b3 = _conv(p["branch3x3dbl_3"], b3, padding=_p(1))
    bp = _conv(p["branch_pool"], _avg_pool_nocountpad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p: dict, x: Array) -> Array:
    b3 = _conv(p["branch3x3"], x, stride=(2, 2))
    bd = _conv(p["branch3x3dbl_1"], x)
    bd = _conv(p["branch3x3dbl_2"], bd, padding=_p(1))
    bd = _conv(p["branch3x3dbl_3"], bd, stride=(2, 2))
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p: dict, x: Array) -> Array:
    b1 = _conv(p["branch1x1"], x)
    b7 = _conv(p["branch7x7_1"], x)
    b7 = _conv(p["branch7x7_2"], b7, padding=_p(0, 3))
    b7 = _conv(p["branch7x7_3"], b7, padding=_p(3, 0))
    bd = _conv(p["branch7x7dbl_1"], x)
    bd = _conv(p["branch7x7dbl_2"], bd, padding=_p(3, 0))
    bd = _conv(p["branch7x7dbl_3"], bd, padding=_p(0, 3))
    bd = _conv(p["branch7x7dbl_4"], bd, padding=_p(3, 0))
    bd = _conv(p["branch7x7dbl_5"], bd, padding=_p(0, 3))
    bp = _conv(p["branch_pool"], _avg_pool_nocountpad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p: dict, x: Array) -> Array:
    b3 = _conv(p["branch3x3_1"], x)
    b3 = _conv(p["branch3x3_2"], b3, stride=(2, 2))
    b7 = _conv(p["branch7x7x3_1"], x)
    b7 = _conv(p["branch7x7x3_2"], b7, padding=_p(0, 3))
    b7 = _conv(p["branch7x7x3_3"], b7, padding=_p(3, 0))
    b7 = _conv(p["branch7x7x3_4"], b7, stride=(2, 2))
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p: dict, x: Array, pool: str) -> Array:
    b1 = _conv(p["branch1x1"], x)
    b3 = _conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv(p["branch3x3_2a"], b3, padding=_p(0, 1)),
        _conv(p["branch3x3_2b"], b3, padding=_p(1, 0)),
    ], axis=-1)
    bd = _conv(p["branch3x3dbl_1"], x)
    bd = _conv(p["branch3x3dbl_2"], bd, padding=_p(1))
    bd = jnp.concatenate([
        _conv(p["branch3x3dbl_3a"], bd, padding=_p(0, 1)),
        _conv(p["branch3x3dbl_3b"], bd, padding=_p(1, 0)),
    ], axis=-1)
    if pool == "avg":  # Mixed_7b (FIDInceptionE_1)
        bp = _avg_pool_nocountpad(x)
    else:  # Mixed_7c (FIDInceptionE_2): max pool, pytorch_fid inception.py
        bp = _max_pool(x, 3, 1, pad=1)
    bp = _conv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# full network
# ---------------------------------------------------------------------------

# (name, kind, extra) in forward order
_LAYOUT = [
    ("Conv2d_1a_3x3", "conv", dict(stride=(2, 2))),
    ("Conv2d_2a_3x3", "conv", {}),
    ("Conv2d_2b_3x3", "conv", dict(padding=_p(1))),
    ("pool1", "maxpool", {}),
    ("Conv2d_3b_1x1", "conv", {}),
    ("Conv2d_4a_3x3", "conv", {}),
    ("pool2", "maxpool", {}),
    ("Mixed_5b", "a", {}), ("Mixed_5c", "a", {}), ("Mixed_5d", "a", {}),
    ("Mixed_6a", "b", {}),
    ("Mixed_6b", "c", {}), ("Mixed_6c", "c", {}),
    ("Mixed_6d", "c", {}), ("Mixed_6e", "c", {}),
    ("Mixed_7a", "d", {}),
    ("Mixed_7b", "e_avg", {}), ("Mixed_7c", "e_max", {}),
]


def inception_pool3(params: dict, x: Array) -> Array:
    """x: (B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    h = x
    for name, kind, extra in _LAYOUT:
        if kind == "conv":
            h = _conv(params[name], h, **extra)
        elif kind == "maxpool":
            h = _max_pool(h, 3, 2)
        elif kind == "a":
            h = _inception_a(params[name], h)
        elif kind == "b":
            h = _inception_b(params[name], h)
        elif kind == "c":
            h = _inception_c(params[name], h)
        elif kind == "e_avg":
            h = _inception_e(params[name], h, "avg")
        elif kind == "e_max":
            h = _inception_e(params[name], h, "max")
        else:
            h = _inception_d(params[name], h)
    return jnp.mean(h, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def preprocess(images: Array, *, resize: bool = True) -> Array:
    """uint8/float images (B, H, W, 3) -> (B, 299, 299, 3) in [-1, 1].

    Matches pytorch-fid: float [0,1], bilinear resize to 299 (half-pixel,
    align_corners=False), then x*2-1."""
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    else:
        x = x.astype(jnp.float32)
    if resize and x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             method="bilinear")
    return 2.0 * x - 1.0


def extract_features(params: dict, images: np.ndarray,
                     batch_size: int = 64) -> np.ndarray:
    """Batched jitted pool3 features for a uint8/float image array."""
    run = jax.jit(lambda im: inception_pool3(params, preprocess(im)))
    feats = []
    n = images.shape[0]
    for i in range(0, n, batch_size):
        batch = images[i: i + batch_size]
        if batch.shape[0] < batch_size:  # pad to avoid a second compile
            pad = batch_size - batch.shape[0]
            batch = np.concatenate([batch, batch[:1].repeat(pad, 0)], 0)
            feats.append(np.asarray(run(batch))[: n - i])
        else:
            feats.append(np.asarray(run(batch)))
    return np.concatenate(feats, axis=0)


# ---------------------------------------------------------------------------
# weight conversion (pt_inception / torchvision state_dict -> folded params)
# ---------------------------------------------------------------------------


def fold_bn(conv_w: np.ndarray, bn_gamma, bn_beta, bn_mean, bn_var,
            eps: float = 1e-3):
    """BasicConv2d = conv(bias=False) + BN(eps=1e-3) + relu -> conv+bias.
    conv_w: torch OIHW."""
    scale = np.asarray(bn_gamma) / np.sqrt(np.asarray(bn_var) + eps)
    w = np.asarray(conv_w) * scale[:, None, None, None]
    b = np.asarray(bn_beta) - np.asarray(bn_mean) * scale
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), \
        b.astype(np.float32)


def convert_pt_inception(sd: Dict[str, np.ndarray]) -> dict:
    """pt_inception / torchvision InceptionV3 state_dict -> folded param
    tree for `inception_pool3`. Keys look like
    'Mixed_5b.branch1x1.conv.weight' / '...bn.weight|bias|running_mean|
    running_var'; the fc head and AuxLogits are ignored."""
    as_np = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                 else np.asarray(v)) for k, v in sd.items()}
    convs = sorted({k[: -len(".conv.weight")] for k in as_np
                    if k.endswith(".conv.weight") and "AuxLogits" not in k})
    params: dict = {}
    for base in convs:
        w, b = fold_bn(as_np[f"{base}.conv.weight"],
                       as_np[f"{base}.bn.weight"],
                       as_np[f"{base}.bn.bias"],
                       as_np[f"{base}.bn.running_mean"],
                       as_np[f"{base}.bn.running_var"])
        node = params
        parts = base.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return params


def load_inception_params(path) -> dict:
    """Load the pt_inception checkpoint file (external artifact; the file
    pytorch-fid downloads as pt_inception-2015-12-05-6726825d.pth)."""
    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        raw = torch.jit.load(str(path), map_location="cpu")
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    # TorchScript exports of torch-fidelity prefix the net ("base.")
    raw = {k.split("base.", 1)[-1] if k.startswith("base.") else k: v
           for k, v in raw.items()}
    return convert_pt_inception(raw)


INCEPTION_URL = ("https://github.com/mseitzer/pytorch-fid/releases/download/"
                 "fid_weights/pt_inception-2015-12-05-6726825d.pth")
