"""FID/IS metric math tests (closed-form Gaussians; no Inception needed)."""

import numpy as np

from qdiffusion_tpu.metrics.fid import (
    compute_statistics,
    fid_from_features,
    frechet_distance,
    inception_score_from_logits,
)


def test_fid_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(512, 16))
    assert abs(fid_from_features(f, f)) < 1e-6


def test_fid_mean_shift_closed_form():
    # same covariance, mean shift d: FID = ||d||^2
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(200_00, 8))
    shift = np.arange(8) * 0.1
    f2 = f1 + shift
    fid = fid_from_features(f1, f2)
    np.testing.assert_allclose(fid, np.sum(shift**2), rtol=1e-3, atol=1e-4)


def test_frechet_diagonal_gaussians():
    # closed form for diagonal covs: sum((sqrt(s1)-sqrt(s2))^2) + ||mu1-mu2||^2
    mu1, mu2 = np.zeros(4), np.ones(4)
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([2.0, 2.0, 1.0, 1.0])
    expected = np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2) + 4.0
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_inception_score_uniform_is_one():
    logits = np.zeros((100, 10))  # uniform p(y|x) == marginal -> IS = 1
    mean, std = inception_score_from_logits(logits, splits=5)
    np.testing.assert_allclose(mean, 1.0, atol=1e-6)


def test_inception_score_confident_classifier():
    # one-hot-ish predictions spread over classes -> IS ~ n_classes
    n, c = 1000, 10
    logits = np.full((n, c), -20.0)
    logits[np.arange(n), np.arange(n) % c] = 20.0
    mean, _ = inception_score_from_logits(logits, splits=2)
    assert mean > 9.0
