"""FID / Inception Score evaluation harness.

The reference evaluates with torch-fidelity *outside* the repo
(README.md:103: 50k samples, FID + IS). Here the metric math is in-repo and
the feature extractor is pluggable, because (a) Inception-V3 weights are an
external artifact and (b) the SURVEY's parity warning applies: FID is only
comparable when the SAME feature pipeline scores both models' samples —
score reference outputs and ours with one extractor.

`InceptionExtractor` loads a standard pt_inception (torch-fidelity /
pytorch-fid style) TorchScript or state-dict checkpoint when a local path
is provided; feature extraction then runs batched on host torch (the
generation ran on TPU; scoring 50k images is minutes of CPU).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Tuple

import numpy as np

Array = np.ndarray


def compute_statistics(features: Array) -> Tuple[Array, Array]:
    """(N, D) features -> (mean, covariance)."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1: Array, sigma1: Array, mu2: Array, sigma2: Array,
                     eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (standard FID formula)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(feats1: Array, feats2: Array) -> float:
    mu1, s1 = compute_statistics(feats1)
    mu2, s2 = compute_statistics(feats2)
    return frechet_distance(mu1, s1, mu2, s2)


def inception_score_from_logits(logits: Array, splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over `splits` chunks."""
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    for chunk in np.array_split(probs, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + 1e-16) - np.log(marginal + 1e-16))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


class InceptionExtractor:
    """pool3 (2048-d) feature extractor from a local Inception checkpoint.

    Uses the native JAX FID-Inception port (metrics/inception.py, parity
    tested vs the torch architecture) — features run jitted on the
    accelerator. Accepts the pytorch-fid pt_inception state-dict/pickled
    model or a TorchScript file (state dict extracted from its parameters).
    Images: (N, H, W, 3) float in [0, 1] or uint8; resized to 299x299
    bilinear (pytorch-fid convention).
    """

    def __init__(self, ckpt_path: str, batch_size: int = 64):
        from qdiffusion_tpu.metrics.inception import load_inception_params

        path = Path(ckpt_path)
        if not path.exists():
            raise FileNotFoundError(
                f"Inception checkpoint not found: {path}. Download the "
                "pt_inception-2015-12-05 model used by torch-fidelity/"
                "pytorch-fid (metrics/inception.py::INCEPTION_URL) and pass "
                "its local path.")
        self.params = load_inception_params(path)
        self.batch_size = batch_size

    def __call__(self, images: Array) -> Array:
        from qdiffusion_tpu.metrics.inception import extract_features

        return extract_features(self.params, np.asarray(images),
                                batch_size=self.batch_size)


def fid_between_dirs(dir1: str, dir2: str, extractor: Callable) -> float:
    """Score two directories of PNGs with one extractor (parity protocol)."""
    from PIL import Image

    def load_dir(d):
        imgs = []
        for p in sorted(Path(d).glob("*.png")):
            imgs.append(np.asarray(Image.open(p), np.float32) / 255.0)
        return np.stack(imgs)

    return fid_from_features(extractor(load_dir(dir1)),
                             extractor(load_dir(dir2)))
