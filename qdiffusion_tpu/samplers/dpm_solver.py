"""DPM-Solver / DPM-Solver++ (Lu et al. 2022), TPU-native.

Re-implementation of the solver used by the reference
(ddim/dpm_solver_pytorch.py and its ldm copy): discrete/linear/cosine
NoiseScheduleVP, model wrapping for all four parameterizations
('noise'/'x_start'/'v'/'score', reference :360-383) with uncond /
classifier / classifier-free guidance (:385-427), singlestep and multistep
solvers of order 1-3 for both algorithm_type variants ('dpmsolver++' data
prediction and 'dpmsolver' noise prediction), solver_type 'dpmsolver' and
'taylor' (:620-676, :749-798, :835-860), and the adaptive step-size method
(:962-1019).

TPU-first structure: for the fixed-grid methods every timestep, logSNR and
update coefficient is a *host-side numpy scalar* precomputed before tracing
(the time grid is static given (steps, order, skip_type)), so the device
program is pure jnp and jit-compatible as a whole. The adaptive method is
data-dependent by nature — instead of the reference's host Python loop
(one device sync per step), it runs as a single `lax.while_loop` with the
schedule math mirrored on-device (`_DeviceSchedule`), so the whole
adaptive sampler is one compiled program with zero host round-trips.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Noise schedule (host-side numpy)
# ---------------------------------------------------------------------------


class NoiseScheduleVP:
    """Continuous-time VP schedule wrapper (reference
    dpm_solver_pytorch.py:6-176). Host-side: all queries take/return numpy."""

    def __init__(self, schedule: str = "discrete",
                 betas: Optional[np.ndarray] = None,
                 alphas_cumprod: Optional[np.ndarray] = None,
                 continuous_beta_0: float = 0.1,
                 continuous_beta_1: float = 20.0):
        self.schedule = schedule
        if schedule == "discrete":
            if betas is not None:
                log_alphas = 0.5 * np.cumsum(np.log(1.0 - np.asarray(betas)))
            else:
                log_alphas = 0.5 * np.log(np.asarray(alphas_cumprod))
            self.total_N = len(log_alphas)
            self.T = 1.0
            self.t_array = np.linspace(0.0, 1.0, self.total_N + 1)[1:]
            self.log_alpha_array = log_alphas
        elif schedule in ("linear", "cosine"):
            self.total_N = 1000
            self.beta_0 = continuous_beta_0
            self.beta_1 = continuous_beta_1
            # improved-DDPM cosine constants (reference :112-122)
            self.cosine_s = 0.008
            self.cosine_beta_max = 999.0
            self.cosine_t_max = (
                math.atan(self.cosine_beta_max * (1.0 + self.cosine_s)
                          / math.pi)
                * 2.0 * (1.0 + self.cosine_s) / math.pi - self.cosine_s)
            self.cosine_log_alpha_0 = math.log(
                math.cos(self.cosine_s / (1.0 + self.cosine_s) * math.pi / 2))
            # T=1 is numerically singular for cosine (reference :118-121)
            self.T = 0.9946 if schedule == "cosine" else 1.0
        else:
            raise NotImplementedError(schedule)

    def marginal_log_mean_coeff(self, t):
        t = np.asarray(t, np.float64)
        if self.schedule == "discrete":
            return np.interp(t, self.t_array, self.log_alpha_array)
        if self.schedule == "linear":
            return (-0.25 * t**2 * (self.beta_1 - self.beta_0)
                    - 0.5 * t * self.beta_0)
        return (np.log(np.cos((t + self.cosine_s) / (1.0 + self.cosine_s)
                              * math.pi / 2))
                - self.cosine_log_alpha_0)

    def marginal_alpha(self, t):
        return np.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mc = self.marginal_log_mean_coeff(t)
        return log_mc - 0.5 * np.log(1.0 - np.exp(2.0 * log_mc))

    def inverse_lambda(self, lamb):
        lamb = np.asarray(lamb, np.float64)
        if self.schedule == "discrete":
            log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lamb)
            # log_alpha_array decreases with t: flip for np.interp
            return np.interp(log_alpha, self.log_alpha_array[::-1],
                             self.t_array[::-1])
        if self.schedule == "linear":
            tmp = (2.0 * (self.beta_1 - self.beta_0)
                   * np.logaddexp(-2.0 * lamb, 0.0))
            delta = self.beta_0**2 + tmp
            return (tmp / (np.sqrt(delta) + self.beta_0)
                    / (self.beta_1 - self.beta_0))
        log_alpha = -0.5 * np.logaddexp(-2.0 * lamb, 0.0)
        return (np.arccos(np.exp(log_alpha + self.cosine_log_alpha_0))
                * 2.0 * (1.0 + self.cosine_s) / math.pi - self.cosine_s)

    def model_input_time(self, t_continuous):
        """Continuous time -> the discrete model's timestep input
        (reference get_model_input_time, dpm_solver_pytorch.py:346-355);
        continuous-time models take t_continuous unchanged."""
        if self.schedule == "discrete":
            return (np.asarray(t_continuous) - 1.0 / self.total_N) * 1000.0
        return np.asarray(t_continuous)


class _DeviceSchedule:
    """jnp mirror of NoiseScheduleVP for traced times (adaptive method)."""

    def __init__(self, ns: NoiseScheduleVP):
        self.ns = ns
        if ns.schedule == "discrete":
            self.t_array = jnp.asarray(ns.t_array, jnp.float32)
            self.log_alpha_array = jnp.asarray(ns.log_alpha_array,
                                               jnp.float32)

    def log_mean_coeff(self, t):
        ns = self.ns
        if ns.schedule == "discrete":
            return jnp.interp(t, self.t_array, self.log_alpha_array)
        if ns.schedule == "linear":
            return (-0.25 * t**2 * (ns.beta_1 - ns.beta_0)
                    - 0.5 * t * ns.beta_0)
        return (jnp.log(jnp.cos((t + ns.cosine_s) / (1.0 + ns.cosine_s)
                                * math.pi / 2))
                - ns.cosine_log_alpha_0)

    def alpha(self, t):
        return jnp.exp(self.log_mean_coeff(t))

    def std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.log_mean_coeff(t)))

    def lam(self, t):
        log_mc = self.log_mean_coeff(t)
        return log_mc - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mc))

    def inverse_lambda(self, lamb):
        ns = self.ns
        if ns.schedule == "discrete":
            log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
            return jnp.interp(log_alpha, self.log_alpha_array[::-1],
                              self.t_array[::-1])
        if ns.schedule == "linear":
            tmp = (2.0 * (ns.beta_1 - ns.beta_0)
                   * jnp.logaddexp(-2.0 * lamb, 0.0))
            delta = ns.beta_0**2 + tmp
            return tmp / (jnp.sqrt(delta) + ns.beta_0) / (ns.beta_1 - ns.beta_0)
        log_alpha = -0.5 * jnp.logaddexp(-2.0 * lamb, 0.0)
        return (jnp.arccos(jnp.exp(log_alpha + ns.cosine_log_alpha_0))
                * 2.0 * (1.0 + ns.cosine_s) / math.pi - ns.cosine_s)

    def model_input_time(self, t):
        if self.ns.schedule == "discrete":
            return (t - 1.0 / self.ns.total_N) * 1000.0
        return t


def get_time_steps(ns: NoiseScheduleVP, skip_type: str, t_T: float,
                   t_0: float, N: int) -> np.ndarray:
    if skip_type == "logSNR":
        lam_T = ns.marginal_lambda(t_T)
        lam_0 = ns.marginal_lambda(t_0)
        return ns.inverse_lambda(np.linspace(lam_T, lam_0, N + 1))
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T**0.5, t_0**0.5, N + 1) ** 2
    raise ValueError(skip_type)


def singlestep_orders(steps: int, order: int) -> List[int]:
    """DPM-Solver-fast order plan (reference :490-546)."""
    if order == 3:
        K = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (K - 2) + [2, 1]
        if steps % 3 == 1:
            return [3] * (K - 1) + [1]
        return [3] * (K - 1) + [2]
    if order == 2:
        K = steps // 2
        if steps % 2 == 0:
            return [2] * K
        return [2] * K + [1]
    if order == 1:
        return [1] * steps
    raise ValueError(order)


# ---------------------------------------------------------------------------
# Model wrapping (parameterizations + guidance), reference :200-430
# ---------------------------------------------------------------------------

# raw_fn(x, t_model_batched) -> model output, guidance already folded in
EpsFn = Callable[[Array, Array], Array]


def make_cfg_eps_fn(model_fn, cond=None, uncond=None,
                    guidance_scale: float = 1.0) -> EpsFn:
    """Classifier-free-guided raw model call (reference model_wrapper
    'classifier-free' branch, dpm_solver_pytorch.py:414-424)."""

    def eps(x, t):
        if cond is None or uncond is None or guidance_scale == 1.0:
            return model_fn(x, t, cond)
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        c_in = jnp.concatenate([uncond, cond], axis=0)
        e = model_fn(x_in, t_in, c_in)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + guidance_scale * (e_c - e_u)

    return eps


def _to_eps(raw: Array, x: Array, alpha_t, sigma_t, model_type: str) -> Array:
    """Convert a raw model output to noise prediction (reference
    noise_pred_fn, dpm_solver_pytorch.py:360-383)."""
    if model_type == "noise":
        return raw
    if model_type == "x_start":
        return (x - alpha_t * raw) / sigma_t
    if model_type == "v":
        return alpha_t * raw + sigma_t * x
    if model_type == "score":
        return -sigma_t * raw
    raise ValueError(model_type)


@dataclasses.dataclass
class _Solver:
    ns: NoiseScheduleVP
    eps_fn: EpsFn  # raw model output with guidance folded in
    batch: int
    pp: bool  # algorithm_type == 'dpmsolver++'
    model_type: str = "noise"
    # classifier guidance (reference :385-412): eps <- eps - s*sigma_t*grad
    classifier_grad_fn: Optional[Callable] = None
    classifier_scale: float = 1.0

    def _noise_pred(self, x: Array, tb: Array, alpha_t, sigma_t,
                    t_model) -> Array:
        eps = _to_eps(self.eps_fn(x, tb), x, alpha_t, sigma_t,
                      self.model_type)
        if self.classifier_grad_fn is not None:
            grad = self.classifier_grad_fn(x, tb)
            eps = eps - self.classifier_scale * sigma_t * grad
        return eps

    def model(self, x: Array, t_cont: float) -> Array:
        """Model value at a host-known continuous time: eps (dpmsolver) or
        predicted x0 (dpmsolver++, data_prediction_fn :441-450)."""
        t_model = float(self.ns.model_input_time(t_cont))
        tb = jnp.full((self.batch,), t_model, jnp.float32)
        alpha = float(self.ns.marginal_alpha(t_cont))
        sigma = float(self.ns.marginal_std(t_cont))
        eps = self._noise_pred(x, tb, alpha, sigma, t_model)
        if not self.pp:
            return eps
        return (x - sigma * eps) / alpha

    def model_dev(self, x: Array, t_cont: Array, ds: _DeviceSchedule) -> Array:
        """Same as model() but for a traced continuous time (adaptive)."""
        tb = jnp.full((self.batch,), ds.model_input_time(t_cont), jnp.float32)
        alpha, sigma = ds.alpha(t_cont), ds.std(t_cont)
        eps = self._noise_pred(x, tb, alpha, sigma, t_cont)
        if not self.pp:
            return eps
        return (x - sigma * eps) / alpha

    # -- update rules with host-precomputed scalar coefficients ------------

    def coeffs_first(self, s: float, t: float) -> dict:
        ns = self.ns
        h = ns.marginal_lambda(t) - ns.marginal_lambda(s)
        if self.pp:
            return dict(
                c_x=float(ns.marginal_std(t) / ns.marginal_std(s)),
                c_m=float(-ns.marginal_alpha(t) * np.expm1(-h)))
        return dict(
            c_x=float(np.exp(ns.marginal_log_mean_coeff(t)
                             - ns.marginal_log_mean_coeff(s))),
            c_m=float(-ns.marginal_std(t) * np.expm1(h)))

    def first_update(self, x: Array, s: float, t: float,
                     model_s: Optional[Array] = None) -> Array:
        c = self.coeffs_first(s, t)
        if model_s is None:
            model_s = self.model(x, s)
        return c["c_x"] * x + c["c_m"] * model_s

    def second_update(self, x: Array, s: float, t: float, r1: float = 0.5,
                      solver_type: str = "dpmsolver") -> Array:
        """Singlestep order 2, 'dpmsolver' or 'taylor' variant
        (reference :602-676)."""
        ns = self.ns
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = float(ns.inverse_lambda(lam_s + r1 * h))
        model_s = self.model(x, s)
        if self.pp:
            sig_s, sig_s1, sig_t = (ns.marginal_std(v) for v in (s, s1, t))
            a_s1, a_t = ns.marginal_alpha(s1), ns.marginal_alpha(t)
            phi11, phi1 = np.expm1(-r1 * h), np.expm1(-h)
            x_s1 = float(sig_s1 / sig_s) * x - float(a_s1 * phi11) * model_s
            model_s1 = self.model(x_s1, s1)
            if solver_type == "taylor":
                c_d = float(1.0 / r1 * a_t * (phi1 / h + 1.0))
            else:
                c_d = float(-0.5 / r1 * a_t * phi1)
            return (float(sig_t / sig_s) * x
                    - float(a_t * phi1) * model_s
                    + c_d * (model_s1 - model_s))
        la_s, la_s1, la_t = (ns.marginal_log_mean_coeff(v) for v in (s, s1, t))
        sig_s1, sig_t = ns.marginal_std(s1), ns.marginal_std(t)
        phi11, phi1 = np.expm1(r1 * h), np.expm1(h)
        x_s1 = float(np.exp(la_s1 - la_s)) * x - float(sig_s1 * phi11) * model_s
        model_s1 = self.model(x_s1, s1)
        if solver_type == "taylor":
            c_d = float(-1.0 / r1 * sig_t * (phi1 / h - 1.0))
        else:
            c_d = float(-0.5 / r1 * sig_t * phi1)
        return (float(np.exp(la_t - la_s)) * x
                - float(sig_t * phi1) * model_s
                + c_d * (model_s1 - model_s))

    def third_update(self, x: Array, s: float, t: float,
                     r1: float = 1.0 / 3.0, r2: float = 2.0 / 3.0,
                     solver_type: str = "dpmsolver") -> Array:
        """Singlestep order 3, 'dpmsolver' or 'taylor' variant
        (reference :686-801)."""
        ns = self.ns
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = float(ns.inverse_lambda(lam_s + r1 * h))
        s2 = float(ns.inverse_lambda(lam_s + r2 * h))
        model_s = self.model(x, s)
        if self.pp:
            sig_s, sig_s1, sig_s2, sig_t = (
                ns.marginal_std(v) for v in (s, s1, s2, t))
            a_s1, a_s2, a_t = (ns.marginal_alpha(v) for v in (s1, s2, t))
            phi11, phi12, phi1 = (np.expm1(-r1 * h), np.expm1(-r2 * h),
                                  np.expm1(-h))
            phi22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
            phi2 = phi1 / h + 1.0
            phi3 = phi2 / h - 0.5
            x_s1 = float(sig_s1 / sig_s) * x - float(a_s1 * phi11) * model_s
            model_s1 = self.model(x_s1, s1)
            x_s2 = (float(sig_s2 / sig_s) * x
                    - float(a_s2 * phi12) * model_s
                    + float(r2 / r1 * a_s2 * phi22) * (model_s1 - model_s))
            model_s2 = self.model(x_s2, s2)
            if solver_type == "taylor":
                d1_0 = (1.0 / r1) * (model_s1 - model_s)
                d1_1 = (1.0 / r2) * (model_s2 - model_s)
                d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
                d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
                return (float(sig_t / sig_s) * x
                        - float(a_t * phi1) * model_s
                        + float(a_t * phi2) * d1
                        - float(a_t * phi3) * d2)
            return (float(sig_t / sig_s) * x
                    - float(a_t * phi1) * model_s
                    + float(1.0 / r2 * a_t * phi2) * (model_s2 - model_s))
        la = {v: ns.marginal_log_mean_coeff(v) for v in (s, s1, s2, t)}
        sig_s1, sig_s2, sig_t = (ns.marginal_std(v) for v in (s1, s2, t))
        phi11, phi12, phi1 = np.expm1(r1 * h), np.expm1(r2 * h), np.expm1(h)
        phi22 = np.expm1(r2 * h) / (r2 * h) - 1.0
        phi2 = phi1 / h - 1.0
        phi3 = phi2 / h - 0.5
        x_s1 = float(np.exp(la[s1] - la[s])) * x - float(sig_s1 * phi11) * model_s
        model_s1 = self.model(x_s1, s1)
        x_s2 = (float(np.exp(la[s2] - la[s])) * x
                - float(sig_s2 * phi12) * model_s
                - float(r2 / r1 * sig_s2 * phi22) * (model_s1 - model_s))
        model_s2 = self.model(x_s2, s2)
        if solver_type == "taylor":
            d1_0 = (1.0 / r1) * (model_s1 - model_s)
            d1_1 = (1.0 / r2) * (model_s2 - model_s)
            d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
            d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
            return (float(np.exp(la[t] - la[s])) * x
                    - float(sig_t * phi1) * model_s
                    - float(sig_t * phi2) * d1
                    - float(sig_t * phi3) * d2)
        return (float(np.exp(la[t] - la[s])) * x
                - float(sig_t * phi1) * model_s
                - float(1.0 / r2 * sig_t * phi2) * (model_s2 - model_s))

    def multistep_second(self, x, m0, m1, t_prev1: float, t_prev0: float,
                         t: float, solver_type: str = "dpmsolver") -> Array:
        ns = self.ns
        lam_p1, lam_p0, lam_t = (ns.marginal_lambda(v)
                                 for v in (t_prev1, t_prev0, t))
        h0, h = lam_p0 - lam_p1, lam_t - lam_p0
        r0 = h0 / h
        d1 = (m0 - m1) / r0
        if self.pp:
            phi1 = np.expm1(-h)
            a_t = ns.marginal_alpha(t)
            if solver_type == "taylor":
                c_d = float(a_t * (phi1 / h + 1.0))
            else:
                c_d = float(-0.5 * a_t * phi1)
            return (float(ns.marginal_std(t) / ns.marginal_std(t_prev0)) * x
                    - float(a_t * phi1) * m0 + c_d * d1)
        phi1 = np.expm1(h)
        sig_t = ns.marginal_std(t)
        c_x = np.exp(ns.marginal_log_mean_coeff(t)
                     - ns.marginal_log_mean_coeff(t_prev0))
        if solver_type == "taylor":
            c_d = float(-sig_t * (phi1 / h - 1.0))
        else:
            c_d = float(-0.5 * sig_t * phi1)
        return float(c_x) * x - float(sig_t * phi1) * m0 + c_d * d1

    def multistep_third(self, x, m0, m1, m2, t_prev2: float, t_prev1: float,
                        t_prev0: float, t: float) -> Array:
        ns = self.ns
        lam_p2, lam_p1, lam_p0, lam_t = (
            ns.marginal_lambda(v) for v in (t_prev2, t_prev1, t_prev0, t))
        h1, h0, h = lam_p1 - lam_p2, lam_p0 - lam_p1, lam_t - lam_p0
        r0, r1 = h0 / h, h1 / h
        d1_0 = (m0 - m1) / r0
        d1_1 = (m1 - m2) / r1
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        if self.pp:
            phi1 = np.expm1(-h)
            phi2 = phi1 / h + 1.0
            phi3 = phi2 / h - 0.5
            a_t = ns.marginal_alpha(t)
            return (float(ns.marginal_std(t) / ns.marginal_std(t_prev0)) * x
                    - float(a_t * phi1) * m0 + float(a_t * phi2) * d1
                    - float(a_t * phi3) * d2)
        phi1 = np.expm1(h)
        phi2 = phi1 / h - 1.0
        phi3 = phi2 / h - 0.5
        sig_t = ns.marginal_std(t)
        c_x = np.exp(ns.marginal_log_mean_coeff(t)
                     - ns.marginal_log_mean_coeff(t_prev0))
        return (float(c_x) * x - float(sig_t * phi1) * m0
                - float(sig_t * phi2) * d1 - float(sig_t * phi3) * d2)

    # -- device-time updates (adaptive method) -----------------------------

    def first_update_dev(self, x, s, t, ds: _DeviceSchedule, model_s=None):
        if model_s is None:
            model_s = self.model_dev(x, s, ds)
        h = ds.lam(t) - ds.lam(s)
        if self.pp:
            x_t = (ds.std(t) / ds.std(s) * x
                   - ds.alpha(t) * jnp.expm1(-h) * model_s)
        else:
            x_t = (jnp.exp(ds.log_mean_coeff(t) - ds.log_mean_coeff(s)) * x
                   - ds.std(t) * jnp.expm1(h) * model_s)
        return x_t, model_s

    def second_update_dev(self, x, s, t, ds: _DeviceSchedule, r1: float,
                          solver_type: str, model_s=None,
                          return_s1: bool = False):
        lam_s, lam_t = ds.lam(s), ds.lam(t)
        h = lam_t - lam_s
        s1 = ds.inverse_lambda(lam_s + r1 * h)
        if model_s is None:
            model_s = self.model_dev(x, s, ds)
        if self.pp:
            phi11, phi1 = jnp.expm1(-r1 * h), jnp.expm1(-h)
            x_s1 = (ds.std(s1) / ds.std(s) * x
                    - ds.alpha(s1) * phi11 * model_s)
            model_s1 = self.model_dev(x_s1, s1, ds)
            if solver_type == "taylor":
                c_d = 1.0 / r1 * ds.alpha(t) * (phi1 / h + 1.0)
            else:
                c_d = -0.5 / r1 * ds.alpha(t) * phi1
            x_t = (ds.std(t) / ds.std(s) * x
                   - ds.alpha(t) * phi1 * model_s
                   + c_d * (model_s1 - model_s))
        else:
            phi11, phi1 = jnp.expm1(r1 * h), jnp.expm1(h)
            x_s1 = (jnp.exp(ds.log_mean_coeff(s1) - ds.log_mean_coeff(s)) * x
                    - ds.std(s1) * phi11 * model_s)
            model_s1 = self.model_dev(x_s1, s1, ds)
            if solver_type == "taylor":
                c_d = -1.0 / r1 * ds.std(t) * (phi1 / h - 1.0)
            else:
                c_d = -0.5 / r1 * ds.std(t) * phi1
            x_t = (jnp.exp(ds.log_mean_coeff(t) - ds.log_mean_coeff(s)) * x
                   - ds.std(t) * phi1 * model_s
                   + c_d * (model_s1 - model_s))
        if return_s1:
            return x_t, model_s, model_s1
        return x_t, model_s

    def third_update_dev(self, x, s, t, ds: _DeviceSchedule, r1: float,
                         r2: float, solver_type: str, model_s=None,
                         model_s1=None):
        lam_s, lam_t = ds.lam(s), ds.lam(t)
        h = lam_t - lam_s
        s1 = ds.inverse_lambda(lam_s + r1 * h)
        s2 = ds.inverse_lambda(lam_s + r2 * h)
        if model_s is None:
            model_s = self.model_dev(x, s, ds)
        if self.pp:
            phi11, phi12, phi1 = (jnp.expm1(-r1 * h), jnp.expm1(-r2 * h),
                                  jnp.expm1(-h))
            phi22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi2 = phi1 / h + 1.0
            if model_s1 is None:
                x_s1 = (ds.std(s1) / ds.std(s) * x
                        - ds.alpha(s1) * phi11 * model_s)
                model_s1 = self.model_dev(x_s1, s1, ds)
            x_s2 = (ds.std(s2) / ds.std(s) * x
                    - ds.alpha(s2) * phi12 * model_s
                    + r2 / r1 * ds.alpha(s2) * phi22 * (model_s1 - model_s))
            model_s2 = self.model_dev(x_s2, s2, ds)
            x_t = (ds.std(t) / ds.std(s) * x
                   - ds.alpha(t) * phi1 * model_s
                   + 1.0 / r2 * ds.alpha(t) * phi2 * (model_s2 - model_s))
        else:
            phi11, phi12, phi1 = (jnp.expm1(r1 * h), jnp.expm1(r2 * h),
                                  jnp.expm1(h))
            phi22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
            phi2 = phi1 / h - 1.0
            if model_s1 is None:
                x_s1 = (jnp.exp(ds.log_mean_coeff(s1) - ds.log_mean_coeff(s))
                        * x - ds.std(s1) * phi11 * model_s)
                model_s1 = self.model_dev(x_s1, s1, ds)
            x_s2 = (jnp.exp(ds.log_mean_coeff(s2) - ds.log_mean_coeff(s)) * x
                    - ds.std(s2) * phi12 * model_s
                    - r2 / r1 * ds.std(s2) * phi22 * (model_s1 - model_s))
            model_s2 = self.model_dev(x_s2, s2, ds)
            x_t = (jnp.exp(ds.log_mean_coeff(t) - ds.log_mean_coeff(s)) * x
                   - ds.std(t) * phi1 * model_s
                   - 1.0 / r2 * ds.std(t) * phi2 * (model_s2 - model_s))
        return x_t


# ---------------------------------------------------------------------------
# Adaptive step-size solver (reference :962-1019), one lax.while_loop
# ---------------------------------------------------------------------------


def dpm_solver_adaptive(sol: _Solver, x: Array, t_T: float, t_0: float, *,
                        order: int = 3, h_init: float = 0.05,
                        atol: float = 0.0078, rtol: float = 0.05,
                        theta: float = 0.9, t_err: float = 1e-5,
                        solver_type: str = "dpmsolver",
                        max_nfe_steps: int = 400) -> Array:
    """Adaptive DPM-Solver: lower/higher-order pair, accept when the local
    error estimate E <= 1, step size h <- theta*h*E^(-1/order). Semantics
    follow the reference exactly; the loop itself runs on-device
    (`lax.while_loop`) instead of syncing E to the host every step.
    `max_nfe_steps` bounds the trip count as a safety net."""
    if order not in (2, 3):
        raise ValueError(f"adaptive solver order must be 2 or 3, got {order}")
    ds = _DeviceSchedule(sol.ns)
    lam_0 = ds.lam(jnp.float32(t_0))

    if order == 2:
        r1 = 0.5

        def pair(x, s, t):
            x_low, model_s = sol.first_update_dev(x, s, t, ds)
            x_high, _ = sol.second_update_dev(x, s, t, ds, r1, solver_type,
                                              model_s=model_s)
            return x_low, x_high
    else:
        r1, r2 = 1.0 / 3.0, 2.0 / 3.0

        def pair(x, s, t):
            x_low, model_s, model_s1 = sol.second_update_dev(
                x, s, t, ds, r1, solver_type, return_s1=True)
            x_high = sol.third_update_dev(x, s, t, ds, r1, r2, solver_type,
                                          model_s=model_s, model_s1=model_s1)
            return x_low, x_high

    def cond(carry):
        x, x_prev, s, h, i = carry
        return jnp.logical_and(jnp.abs(s - t_0) > t_err, i < max_nfe_steps)

    def body(carry):
        x, x_prev, s, h, i = carry
        lam_s = ds.lam(s)
        t = ds.inverse_lambda(lam_s + h)
        x_low, x_high = pair(x, s, t)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low),
                                                     jnp.abs(x_prev)))
        err2 = jnp.mean(jnp.square((x_high - x_low) / delta).reshape(
            x.shape[0], -1), axis=-1)
        E = jnp.max(jnp.sqrt(err2))
        accept = E <= 1.0
        x_new = jnp.where(accept, x_high, x)
        x_prev_new = jnp.where(accept, x_low, x_prev)
        s_new = jnp.where(accept, t, s)
        h_new = jnp.minimum(theta * h * E ** (-1.0 / order),
                            lam_0 - ds.lam(s_new))
        return (x_new, x_prev_new, s_new, h_new, i + 1)

    s0 = jnp.float32(t_T)
    h0 = jnp.float32(h_init)
    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, x, s0, h0, jnp.int32(0)))
    return x


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def dpm_solver_sample(
    model_fn,
    x: Array,
    ns: NoiseScheduleVP,
    *,
    steps: int = 20,
    order: int = 3,
    skip_type: str = "time_uniform",
    method: str = "singlestep",
    algorithm_type: str = "dpmsolver++",
    solver_type: str = "dpmsolver",
    model_type: str = "noise",
    lower_order_final: bool = True,
    denoise_to_zero: bool = False,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    cond: Optional[Array] = None,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
    classifier_fn: Optional[Callable] = None,
    classifier_scale: float = 1.0,
    atol: float = 0.0078,
    rtol: float = 0.05,
    eval_dtype=None,
) -> Array:
    """Sample with DPM-Solver(++). model_fn(x, t[, context]) -> model output
    in the `model_type` parameterization ('noise'/'x_start'/'v'/'score').

    eval_dtype: model-evaluation carrier dtype (bf16 deployment) — solver
    math stays f32, only the model input/output are cast (see
    samplers/ddim.py::ddim_sample). None = single-dtype flow.

    Reproduces reference DPM_Solver.sample (dpm_solver_pytorch.py:1055-1259)
    for method in {'singlestep', 'singlestep_fixed', 'multistep',
    'adaptive'} and both solver_types. Guidance: classifier-free via
    (cond, uncond, guidance_scale); classifier guidance via classifier_fn
    (x, t) -> log p(c|x,t), summed log-prob gradient folded into eps
    (reference cond_grad_fn + 'classifier' branch :385-412).
    """
    if solver_type not in ("dpmsolver", "taylor"):
        raise ValueError(solver_type)
    t_0 = 1.0 / ns.total_N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    if cond is not None and model_fn.__code__.co_argcount >= 3:
        base_fn = model_fn
    else:
        base_fn = lambda x, t, c=None: model_fn(x, t)
    if eval_dtype is not None:
        x = x.astype(jnp.float32)  # f32 solver carry
        inner_fn = base_fn
        base_fn = lambda xx, tt, c=None: inner_fn(
            xx.astype(eval_dtype), tt, c).astype(xx.dtype)
    eps_fn = make_cfg_eps_fn(base_fn, cond, uncond, guidance_scale)
    grad_fn = None
    if classifier_fn is not None:
        grad_fn = jax.grad(lambda xx, tt: jnp.sum(classifier_fn(xx, tt)))
    sol = _Solver(ns=ns, eps_fn=eps_fn, batch=x.shape[0],
                  pp=(algorithm_type == "dpmsolver++"),
                  model_type=model_type, classifier_grad_fn=grad_fn,
                  classifier_scale=classifier_scale)

    if method == "adaptive":
        x = dpm_solver_adaptive(sol, x, t_T, t_0, order=order,
                                solver_type=solver_type, atol=atol, rtol=rtol)
    elif method in ("singlestep", "singlestep_fixed"):
        if method == "singlestep":
            orders = singlestep_orders(steps, order)
            if skip_type == "logSNR":
                ts_outer = get_time_steps(ns, skip_type, t_T, t_0, len(orders))
            else:
                ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
                ts_outer = ts[np.cumsum([0] + orders)]
        else:
            K = steps // order
            orders = [order] * K
            ts_outer = get_time_steps(ns, skip_type, t_T, t_0, K)
        for i, o in enumerate(orders):
            s, t = float(ts_outer[i]), float(ts_outer[i + 1])
            ts_inner = get_time_steps(ns, skip_type, s, t, o)
            lam = ns.marginal_lambda(ts_inner)
            h = lam[-1] - lam[0]
            if o == 1:
                x = sol.first_update(x, s, t)
            elif o == 2:
                x = sol.second_update(x, s, t, r1=float((lam[1] - lam[0]) / h),
                                      solver_type=solver_type)
            else:
                x = sol.third_update(x, s, t,
                                     r1=float((lam[1] - lam[0]) / h),
                                     r2=float((lam[2] - lam[0]) / h),
                                     solver_type=solver_type)
    elif method == "multistep":
        assert steps >= order
        ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
        t_prev: List[float] = [float(ts[0])]
        m_prev: List[Array] = [sol.model(x, float(ts[0]))]
        for step in range(1, order):
            t = float(ts[step])
            x = _ms_update(sol, x, m_prev, t_prev, t, step, solver_type)
            t_prev.append(t)
            m_prev.append(sol.model(x, t))
        for step in range(order, steps + 1):
            t = float(ts[step])
            step_order = (min(order, steps + 1 - step)
                          if lower_order_final and steps < 10 else order)
            x = _ms_update(sol, x, m_prev, t_prev, t, step_order, solver_type)
            t_prev = t_prev[1:] + [t] if len(t_prev) >= order else t_prev + [t]
            if step < steps:
                m_new = sol.model(x, t)
                m_prev = (m_prev[1:] + [m_new] if len(m_prev) >= order
                          else m_prev + [m_new])
    else:
        raise ValueError(method)

    if denoise_to_zero:
        # final Euler step to t=0 replacing eps with x0 (reference
        # denoise_to_zero_fn :432-439 == first-order update with x0 pred)
        t_model = float(ns.model_input_time(t_0))
        tb = jnp.full((x.shape[0],), t_model, jnp.float32)
        alpha = float(ns.marginal_alpha(t_0))
        sigma = float(ns.marginal_std(t_0))
        eps = sol._noise_pred(x, tb, alpha, sigma, t_model)
        x = (x - sigma * eps) / alpha
    return x


def _ms_update(sol: _Solver, x, m_prev, t_prev, t: float, order: int,
               solver_type: str = "dpmsolver"):
    if order == 1:
        return sol.first_update(x, t_prev[-1], t, model_s=m_prev[-1])
    if order == 2:
        return sol.multistep_second(x, m_prev[-1], m_prev[-2],
                                    t_prev[-2], t_prev[-1], t, solver_type)
    return sol.multistep_third(x, m_prev[-1], m_prev[-2], m_prev[-3],
                               t_prev[-3], t_prev[-2], t_prev[-1], t)
