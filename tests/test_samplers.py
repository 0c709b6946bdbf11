"""Sampler math parity vs the reference step functions (eta=0 determinism,
closed-form single-step checks, trajectory capture)."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.samplers.ddim import ddim_sample, ddpm_sample
from qdiffusion_tpu.schedules import get_beta_schedule, make_skip_sequence

REF = Path("/root/reference")

BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=100)


def toy_model_jax(x, t):
    # eps-prediction surrogate: scales with t so steps differ
    return 0.1 * x + 0.001 * t[:, None, None, None]


def test_ddim_eta0_matches_reference():
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ddim.functions import denoising

    # patch the reference's hardcoded .to('cuda') shuttling for CPU
    orig_to = torch.Tensor.to

    def fake_to(self, *args, **kw):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        return orig_to(self, *args, **kw)

    torch.Tensor.to = fake_to
    try:
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
        seq = make_skip_sequence(100, 10, "uniform")

        def toy_model_torch(x, t):
            return 0.1 * x + 0.001 * t.float()[:, None, None, None]

        xs, _ = denoising.generalized_steps(
            torch.from_numpy(x0), seq, toy_model_torch,
            torch.from_numpy(BETAS.astype(np.float32)), eta=0.0)
        ref_final = xs[-1].numpy()
    finally:
        torch.Tensor.to = orig_to

    x_nhwc = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours, _ = ddim_sample(toy_model_jax, x_nhwc, seq, BETAS, eta=0.0)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref_final, rtol=1e-4, atol=1e-5)


def test_ddim_single_step_closed_form():
    # one step from t with eta=0: x' = sqrt(a_next)*x0 + sqrt(1-a_next)*et
    seq = [50]
    x = jnp.ones((1, 4, 4, 3))
    model = lambda x, t: 0.5 * jnp.ones_like(x)
    out, _ = ddim_sample(model, x, seq, BETAS, eta=0.0)
    padded = np.cumprod(1 - np.concatenate([[0.0], BETAS]))
    a, a_next = padded[51], padded[0]
    et = 0.5
    x0 = (1.0 - et * np.sqrt(1 - a)) / np.sqrt(a)
    expected = np.sqrt(a_next) * x0 + np.sqrt(1 - a_next) * et
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_ddpm_final_step_no_noise():
    # t=0 step has mask 0 -> deterministic posterior mean
    seq = [0]
    x = 0.3 * jnp.ones((1, 4, 4, 3))
    model = lambda x, t: jnp.zeros_like(x)
    out, _ = ddpm_sample(model, x, seq, BETAS)
    padded = np.cumprod(1 - np.concatenate([[0.0], BETAS]))
    a, am1 = padded[1], padded[0]
    beta_t = 1 - a / am1
    x0 = np.clip(np.sqrt(1 / a) * 0.3, -1, 1)
    mean = (np.sqrt(am1) * beta_t * x0 + np.sqrt(1 - beta_t) * (1 - am1) * 0.3) / (1 - a)
    np.testing.assert_allclose(np.asarray(out), mean, rtol=1e-5)


def test_trajectory_capture_shapes_and_order():
    seq = make_skip_sequence(100, 5, "uniform")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    final, traj = ddim_sample(toy_model_jax, x, seq, BETAS, eta=0.0,
                              return_trajectory=True)
    assert traj["xs"].shape == (5, 2, 4, 4, 3)
    assert traj["ts"].shape == (5, 2)
    # execution order: highest t first
    assert float(traj["ts"][0, 0]) == float(max(seq))
    assert float(traj["ts"][-1, 0]) == float(min(seq))
    # first model input is the initial noise
    np.testing.assert_allclose(np.asarray(traj["xs"][0]), np.asarray(x))


def test_sampler_jits_once():
    seq = make_skip_sequence(100, 10, "uniform")
    f = jax.jit(lambda x: ddim_sample(toy_model_jax, x, seq, BETAS)[0])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    y = f(x)
    assert np.isfinite(np.asarray(y)).all()
