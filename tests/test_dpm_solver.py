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


def _ref_sample(x0_np, steps, order, method, algorithm_type, guidance=None,
                solver_type="dpmsolver", model_type="noise",
                schedule="discrete", classifier=False):
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ddim.dpm_solver_pytorch import NoiseScheduleVP as RefNS
    from ddim.dpm_solver_pytorch import DPM_Solver, model_wrapper

    if schedule == "discrete":
        ns = RefNS(schedule="discrete", betas=torch.from_numpy(BETAS).float())
    else:
        ns = RefNS(schedule=schedule)

    def toy(x, t, cond=None):
        e = 0.1 * x + 0.001 * t.float()[:, None, None, None]
        if cond is not None:
            e = e + 0.05 * cond.mean(dim=(1, 2))[:, None, None, None]
        return e

    kw = {}
    if guidance is not None:
        cond_t, uncond_t, scale = guidance
        kw = dict(guidance_type="classifier-free", condition=cond_t,
                  unconditional_condition=uncond_t, guidance_scale=scale)
    elif classifier:
        kw = dict(
            guidance_type="classifier",
            classifier_fn=lambda x, t, c: -0.5 * (x**2).mean(dim=(1, 2, 3)),
            condition=None, guidance_scale=2.0)
    model_fn = model_wrapper(toy, ns, model_type=model_type, **kw)
    solver = DPM_Solver(model_fn, ns, algorithm_type=algorithm_type)
    if method == "adaptive":
        out = solver.sample(torch.from_numpy(x0_np), order=order,
                            method="adaptive", atol=0.0078, rtol=0.05)
    else:
        out = solver.sample(torch.from_numpy(x0_np), steps=steps, order=order,
                            skip_type="time_uniform", method=method,
                            solver_type=solver_type)
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


# ---------------------------------------------------------------------------
# round-2 completions: taylor, parameterizations, cosine, classifier,
# adaptive (reference :100-122, :178-343, :620-860, :962-1019)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("steps,order,method,alg", [
    (10, 2, "singlestep", "dpmsolver++"),
    (9, 3, "singlestep", "dpmsolver"),
    (15, 2, "multistep", "dpmsolver++"),
    (15, 2, "multistep", "dpmsolver"),
])
def test_parity_taylor(steps, order, method, alg):
    rng = np.random.default_rng(2)
    x0 = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    ref = _ref_sample(x0, steps, order, method, alg, solver_type="taylor")

    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours = dpm_solver_sample(jax_toy, x, ns, steps=steps, order=order,
                             method=method, algorithm_type=alg,
                             solver_type="taylor")
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_type", ["x_start", "v", "score"])
def test_parity_model_types(model_type):
    # batch=1: the reference's x_start/v/score conversions miss the
    # expand_dims on alpha_t/sigma_t (dpm_solver_pytorch.py:298-307) and
    # crash for batch>1 on 4-D data; ours broadcasts per-sample correctly,
    # so parity is only checkable where the reference runs.
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    ref = _ref_sample(x0, 12, 2, "multistep", "dpmsolver++",
                      model_type=model_type)

    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours = dpm_solver_sample(jax_toy, x, ns, steps=12, order=2,
                             method="multistep", model_type=model_type)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


def test_cosine_schedule_parity():
    """Cosine marginal functions + a full continuous-time sample match the
    reference (dpm_solver_pytorch.py:112-122, :134-137, :172-176)."""
    import torch
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    from ddim.dpm_solver_pytorch import NoiseScheduleVP as RefNS

    ref_ns = RefNS(schedule="cosine")
    ns = NoiseScheduleVP("cosine")
    assert ns.T == ref_ns.T == 0.9946
    t = np.linspace(0.01, ns.T, 17)
    tt = torch.from_numpy(t)
    np.testing.assert_allclose(
        ns.marginal_log_mean_coeff(t),
        ref_ns.marginal_log_mean_coeff(tt).numpy(), rtol=1e-6)
    lam = ns.marginal_lambda(t)
    np.testing.assert_allclose(
        lam, ref_ns.marginal_lambda(tt).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        ns.inverse_lambda(lam),
        ref_ns.inverse_lambda(torch.from_numpy(lam)).numpy(),
        rtol=1e-5, atol=1e-6)

    rng = np.random.default_rng(4)
    x0 = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    ref = _ref_sample(x0, 10, 2, "multistep", "dpmsolver++",
                      schedule="cosine")
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours = dpm_solver_sample(jax_toy, x, ns, steps=10, order=2,
                             method="multistep")
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


def test_classifier_guidance_parity():
    """Classifier guidance: grad of summed log-prob folded into eps
    (reference cond_grad_fn + 'classifier' branch, :385-412).
    batch=1 again: the reference's sigma_t*cond_grad misses expand_dims."""
    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    ref = _ref_sample(x0, 10, 2, "multistep", "dpmsolver",
                      classifier=True)

    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    clf = lambda xx, tt: -0.5 * jnp.mean(xx**2, axis=(1, 2, 3))
    ours = dpm_solver_sample(jax_toy, x, ns, steps=10, order=2,
                             method="multistep", algorithm_type="dpmsolver",
                             classifier_fn=clf, classifier_scale=2.0)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("order", [2, 3])
def test_adaptive_parity(order):
    """Adaptive step-size solver matches the reference's host-loop result
    (ours is one lax.while_loop; same accept/step-size logic, :962-1019)."""
    rng = np.random.default_rng(6)
    x0 = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    ref = _ref_sample(x0, None, order, "adaptive", "dpmsolver++")

    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    ours = dpm_solver_sample(jax_toy, x, ns, order=order, method="adaptive")
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    # float32 while_loop vs torch float64-ish host loop: modest tolerance
    np.testing.assert_allclose(ours_nchw, ref, rtol=2e-3, atol=2e-4)


def test_adaptive_is_jittable():
    import jax

    ns = NoiseScheduleVP("discrete", betas=BETAS)

    @jax.jit
    def run(x):
        return dpm_solver_sample(jax_toy, x, ns, order=3, method="adaptive")

    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 8, 8, 3)).astype(np.float32))
    y = run(x)
    assert np.isfinite(np.asarray(y)).all()


def test_denoise_to_zero():
    ns = NoiseScheduleVP("discrete", betas=BETAS)
    x = jnp.asarray(np.random.default_rng(8).normal(
        size=(2, 8, 8, 3)).astype(np.float32))
    y0 = dpm_solver_sample(jax_toy, x, ns, steps=8, order=2,
                           method="multistep")
    y1 = dpm_solver_sample(jax_toy, x, ns, steps=8, order=2,
                           method="multistep", denoise_to_zero=True)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    assert np.isfinite(np.asarray(y1)).all()
