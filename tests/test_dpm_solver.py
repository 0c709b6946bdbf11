"""DPM-Solver(++): golden parity vs the reference solver on a toy model."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.samplers.dpm_solver import (
    NoiseScheduleVP,
    dpm_solver_sample,
    get_time_steps,
    singlestep_orders,
)
from qdiffusion_tpu.schedules import get_beta_schedule

REF = Path("/root/reference")

BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=1000)


def _ref_sample(x0_np, steps, order, method, algorithm_type, guidance=None):
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ddim.dpm_solver_pytorch import NoiseScheduleVP as RefNS
    from ddim.dpm_solver_pytorch import DPM_Solver, model_wrapper

    ns = RefNS(schedule="discrete", betas=torch.from_numpy(BETAS).float())

    def toy(x, t, cond=None):
        e = 0.1 * x + 0.001 * t.float()[:, None, None, None]
        if cond is not None:
            e = e + 0.05 * cond.mean(dim=(1, 2))[:, None, None, None]
        return e

    if guidance is None:
        model_fn = model_wrapper(toy, ns, model_type="noise")
    else:
        cond_t, uncond_t, scale = guidance
        model_fn = model_wrapper(
            toy, ns, model_type="noise", guidance_type="classifier-free",
            condition=cond_t, unconditional_condition=uncond_t,
            guidance_scale=scale)
    solver = DPM_Solver(model_fn, ns, algorithm_type=algorithm_type)
    out = solver.sample(torch.from_numpy(x0_np), steps=steps, order=order,
                        skip_type="time_uniform", method=method)
    return out.numpy()


def jax_toy(x, t, c=None):
    e = 0.1 * x + 0.001 * t[:, None, None, None]
    if c is not None:
        e = e + 0.05 * jnp.mean(c, axis=(1, 2))[:, None, None, None]
    return e


@pytest.mark.parametrize("steps,order,method,alg", [
    (12, 3, "singlestep", "dpmsolver++"),  # CIFAR reference path
    (20, 2, "multistep", "dpmsolver++"),  # LDM reference path
    (10, 2, "singlestep", "dpmsolver"),
    (15, 3, "multistep", "dpmsolver"),
    (8, 1, "singlestep", "dpmsolver++"),
])
def test_parity(steps, order, method, alg):
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    ref = _ref_sample(x0, steps, order, method, alg)

    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours = dpm_solver_sample(jax_toy, x, ns, steps=steps, order=order,
                             method=method, algorithm_type=alg)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


def test_parity_cfg():
    import torch

    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    cond = rng.normal(size=(2, 5, 4)).astype(np.float32)
    uncond = np.zeros_like(cond)
    ref = _ref_sample(x0, 15, 2, "multistep", "dpmsolver++",
                      guidance=(torch.from_numpy(cond),
                                torch.from_numpy(uncond), 4.0))

    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours = dpm_solver_sample(jax_toy, x, ns, steps=15, order=2,
                             method="multistep",
                             cond=jnp.asarray(cond), uncond=jnp.asarray(uncond),
                             guidance_scale=4.0)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


def test_order_plans():
    assert singlestep_orders(12, 3) == [3] * 3 + [2, 1]
    assert singlestep_orders(13, 3) == [3] * 4 + [1]
    assert singlestep_orders(14, 3) == [3] * 4 + [2]
    assert singlestep_orders(10, 2) == [2] * 5
    assert singlestep_orders(9, 2) == [2] * 4 + [1]


def test_schedule_roundtrip():
    ns = NoiseScheduleVP("discrete", betas=BETAS)
    t = np.array([0.1, 0.5, 0.9])
    lam = ns.marginal_lambda(t)
    np.testing.assert_allclose(ns.inverse_lambda(lam), t, atol=1e-5)
