"""Data transforms and dataset access.

The inference flow needs only the value-range transforms (reference
ddim/datasets/__init__.py:204-230): rescale [0,1] <-> [-1,1], optional
logit transform, uniform/Gaussian dequantization (training-side), and the
clamped inverse used when writing samples. Dataset *loaders* (CIFAR-10 /
CelebA / LSUN / FFHQ, reference ddim/datasets/*.py) exist upstream only to
define these transforms and to train; PTQ consumes pre-generated
calibration trajectories, so loaders here are a thin numpy-file interface.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DataTransformConfig:
    rescaled: bool = True
    logit_transform: bool = False
    uniform_dequantization: bool = False
    gaussian_dequantization: bool = False


def logit(x: Array, eps: float = 1e-6) -> Array:
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x) - jnp.log1p(-x)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def data_transform(cfg: DataTransformConfig, x: Array,
                   rng: Optional[jax.Array] = None) -> Array:
    """[0,1] images -> model space."""
    if cfg.uniform_dequantization:
        assert rng is not None
        x = (x * 255.0 + jax.random.uniform(rng, x.shape)) / 256.0
    if cfg.gaussian_dequantization:
        assert rng is not None
        x = x + jax.random.normal(rng, x.shape) * 0.01
    if cfg.rescaled:
        x = 2.0 * x - 1.0
    elif cfg.logit_transform:
        x = logit(x)
    return x


def inverse_data_transform(cfg: DataTransformConfig, x: Array) -> Array:
    """Model space -> [0,1] images with clamp (reference :223-230)."""
    if cfg.logit_transform:
        x = sigmoid(x)
    elif cfg.rescaled:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)


def load_image_folder(path, limit: Optional[int] = None):
    """PNG folder -> (N, H, W, C) float32 in [0,1] (FID scoring input)."""
    import numpy as np
    from PIL import Image

    files = sorted(Path(path).glob("*.png"))
    if limit:
        files = files[:limit]
    return np.stack([np.asarray(Image.open(f), np.float32) / 255.0
                     for f in files])
