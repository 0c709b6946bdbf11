"""Beta schedule and timestep-selection tests vs closed-form values."""

import numpy as np

from qdiffusion_tpu.schedules import (
    NoiseSchedule,
    get_beta_schedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    make_skip_sequence,
)


def test_linear_schedule_endpoints():
    b = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=1000)
    assert b.shape == (1000,)
    np.testing.assert_allclose(b[0], 1e-4)
    np.testing.assert_allclose(b[-1], 0.02)


def test_quad_schedule_is_sqrt_space():
    b = get_beta_schedule("quad", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=10)
    expected = np.linspace(1e-2, 0.02**0.5, 10) ** 2
    np.testing.assert_allclose(b, expected)


def test_jsd_and_const():
    b = get_beta_schedule("jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=4)
    np.testing.assert_allclose(b, [1 / 4, 1 / 3, 1 / 2, 1.0])
    b = get_beta_schedule("const", beta_start=0, beta_end=0.5,
                          num_diffusion_timesteps=3)
    np.testing.assert_allclose(b, [0.5, 0.5, 0.5])


def test_ldm_linear_is_ddpm_quad():
    a = make_beta_schedule("linear", 100, 1e-4, 2e-2)
    b = get_beta_schedule("quad", beta_start=1e-4, beta_end=2e-2,
                          num_diffusion_timesteps=100)
    np.testing.assert_allclose(a, b)


def test_cosine_schedule_bounds():
    b = make_beta_schedule("cosine", 1000)
    assert (b >= 0).all() and (b <= 0.999).all()
    assert b[-1] == 0.999  # tail clipped


def test_skip_sequence_uniform_quad():
    seq = make_skip_sequence(1000, 100, "uniform")
    assert seq == list(range(0, 1000, 10))
    seq = make_skip_sequence(1000, 100, "quad")
    assert len(seq) == 100 and seq[0] == 0 and max(seq) < 1000
    assert sorted(seq) == seq


def test_ddim_timesteps_plus_one_shift():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts[0] == 1 and ts.shape == (50,)
    assert np.all(np.diff(ts) == 20)


def test_ddim_sigma_eta_zero():
    sched = NoiseSchedule.ldm("linear", 1000, 0.00085, 0.012)
    ac = sched.alphas_cumprod
    ts = make_ddim_timesteps("uniform", 50, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta=0.0)
    np.testing.assert_allclose(sigmas, 0.0)
    np.testing.assert_allclose(alphas, ac[ts])
    assert alphas_prev[0] == ac[0]


def test_padded_cumprod_indexing():
    sched = NoiseSchedule.ddpm("linear", 1e-4, 0.02, 1000)
    padded = sched.alphas_cumprod_padded
    # index t+1 gives cumprod over first t+1 betas (compute_alpha semantics)
    np.testing.assert_allclose(padded[0], 1.0)
    np.testing.assert_allclose(padded[1], 1 - sched.betas[0])
    np.testing.assert_allclose(padded[1000], sched.alphas_cumprod[-1])
