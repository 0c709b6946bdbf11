"""DPM-Solver / DPM-Solver++ (Lu et al. 2022), TPU-native.

Re-implementation of the solver used by the reference
(ddim/dpm_solver_pytorch.py and its ldm copy): discrete/linear
NoiseScheduleVP, noise-prediction model wrapping with classifier-free
guidance, and singlestep/multistep solvers of order 1-3 for both
algorithm_type variants ('dpmsolver++' data prediction and 'dpmsolver'
noise prediction), solver_type 'dpmsolver'.

TPU-first structure: every timestep, logSNR, and update coefficient is a
*host-side numpy scalar* precomputed before tracing (the time grid is
static given (steps, order, skip_type)); the device program is a sequence
of lax.scan groups over steps of identical structure, so a 50-NFE sample
compiles a single UNet body per order instead of unrolling 50 copies.
"""

from __future__ import annotations

import dataclasses
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
        elif schedule == "linear":
            self.total_N = 1000
            self.beta_0 = continuous_beta_0
            self.beta_1 = continuous_beta_1
            self.T = 1.0
        else:
            raise NotImplementedError(schedule)

    def marginal_log_mean_coeff(self, t):
        t = np.asarray(t, np.float64)
        if self.schedule == "discrete":
            return np.interp(t, self.t_array, self.log_alpha_array)
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

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
        tmp = 2.0 * (self.beta_1 - self.beta_0) * np.logaddexp(-2.0 * lamb, 0.0)
        delta = self.beta_0**2 + tmp
        return tmp / (np.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)

    def model_input_time(self, t_continuous):
        """Continuous time -> the discrete model's timestep input
        (reference get_model_input_time, dpm_solver_pytorch.py:279-289)."""
        if self.schedule == "discrete":
            return (np.asarray(t_continuous) - 1.0 / self.total_N) * 1000.0
        return 1000.0 * np.maximum(np.asarray(t_continuous) - 1.0 / self.total_N, 0.0)


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
# Solver
# ---------------------------------------------------------------------------

# model_eps_fn(x, t_model_batched) -> eps, CFG already folded in by caller
EpsFn = Callable[[Array, Array], Array]


def make_cfg_eps_fn(model_fn, cond=None, uncond=None,
                    guidance_scale: float = 1.0) -> EpsFn:
    """Classifier-free-guided noise prediction (reference model_wrapper
    'classifier-free' branch, dpm_solver_pytorch.py:317-341)."""

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


@dataclasses.dataclass
class _Solver:
    ns: NoiseScheduleVP
    eps_fn: EpsFn
    batch: int
    pp: bool  # algorithm_type == 'dpmsolver++'

    def model(self, x: Array, t_cont: float) -> Array:
        """Model value at a host-known continuous time: eps (dpmsolver) or
        predicted x0 (dpmsolver++, data_prediction_fn :441-450)."""
        t_model = float(self.ns.model_input_time(t_cont))
        tb = jnp.full((self.batch,), t_model, jnp.float32)
        eps = self.eps_fn(x, tb)
        if not self.pp:
            return eps
        alpha = float(self.ns.marginal_alpha(t_cont))
        sigma = float(self.ns.marginal_std(t_cont))
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

    def second_update(self, x: Array, s: float, t: float,
                      r1: float = 0.5) -> Array:
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
            return (float(sig_t / sig_s) * x
                    - float(a_t * phi1) * model_s
                    - float(0.5 / r1 * a_t * phi1) * (model_s1 - model_s))
        la_s, la_s1, la_t = (ns.marginal_log_mean_coeff(v) for v in (s, s1, t))
        sig_s1, sig_t = ns.marginal_std(s1), ns.marginal_std(t)
        phi11, phi1 = np.expm1(r1 * h), np.expm1(h)
        x_s1 = float(np.exp(la_s1 - la_s)) * x - float(sig_s1 * phi11) * model_s
        model_s1 = self.model(x_s1, s1)
        return (float(np.exp(la_t - la_s)) * x
                - float(sig_t * phi1) * model_s
                - float(0.5 / r1 * sig_t * phi1) * (model_s1 - model_s))

    def third_update(self, x: Array, s: float, t: float,
                     r1: float = 1.0 / 3.0, r2: float = 2.0 / 3.0) -> Array:
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
            x_s1 = float(sig_s1 / sig_s) * x - float(a_s1 * phi11) * model_s
            model_s1 = self.model(x_s1, s1)
            x_s2 = (float(sig_s2 / sig_s) * x
                    - float(a_s2 * phi12) * model_s
                    + float(r2 / r1 * a_s2 * phi22) * (model_s1 - model_s))
            model_s2 = self.model(x_s2, s2)
            return (float(sig_t / sig_s) * x
                    - float(a_t * phi1) * model_s
                    + float(1.0 / r2 * a_t * phi2) * (model_s2 - model_s))
        la = {v: ns.marginal_log_mean_coeff(v) for v in (s, s1, s2, t)}
        sig_s1, sig_s2, sig_t = (ns.marginal_std(v) for v in (s1, s2, t))
        phi11, phi12, phi1 = np.expm1(r1 * h), np.expm1(r2 * h), np.expm1(h)
        phi22 = np.expm1(r2 * h) / (r2 * h) - 1.0
        phi2 = phi1 / h - 1.0
        x_s1 = float(np.exp(la[s1] - la[s])) * x - float(sig_s1 * phi11) * model_s
        model_s1 = self.model(x_s1, s1)
        x_s2 = (float(np.exp(la[s2] - la[s])) * x
                - float(sig_s2 * phi12) * model_s
                - float(r2 / r1 * sig_s2 * phi22) * (model_s1 - model_s))
        model_s2 = self.model(x_s2, s2)
        return (float(np.exp(la[t] - la[s])) * x
                - float(sig_t * phi1) * model_s
                - float(1.0 / r2 * sig_t * phi2) * (model_s2 - model_s))

    def multistep_second(self, x, m0, m1, t_prev1: float, t_prev0: float,
                         t: float) -> Array:
        ns = self.ns
        lam_p1, lam_p0, lam_t = (ns.marginal_lambda(v)
                                 for v in (t_prev1, t_prev0, t))
        h0, h = lam_p0 - lam_p1, lam_t - lam_p0
        r0 = h0 / h
        d1 = (m0 - m1) / r0
        if self.pp:
            phi1 = np.expm1(-h)
            return (float(ns.marginal_std(t) / ns.marginal_std(t_prev0)) * x
                    - float(ns.marginal_alpha(t) * phi1) * m0
                    - float(0.5 * ns.marginal_alpha(t) * phi1) * d1)
        phi1 = np.expm1(h)
        c_x = np.exp(ns.marginal_log_mean_coeff(t)
                     - ns.marginal_log_mean_coeff(t_prev0))
        return (float(c_x) * x - float(ns.marginal_std(t) * phi1) * m0
                - float(0.5 * ns.marginal_std(t) * phi1) * d1)

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
    lower_order_final: bool = True,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    cond: Optional[Array] = None,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
) -> Array:
    """Sample with DPM-Solver(++). model_fn(x, t[, context]) -> eps.

    Reproduces reference DPM_Solver.sample (dpm_solver_pytorch.py:1055-1259)
    for method in {'singlestep', 'multistep'}. The step plan is host-static;
    the device program is pure jnp (jit-compatible as a whole).
    """
    t_0 = 1.0 / ns.total_N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    if cond is not None and model_fn.__code__.co_argcount >= 3:
        base_fn = model_fn
    else:
        base_fn = lambda x, t, c=None: model_fn(x, t)
    eps_fn = make_cfg_eps_fn(base_fn, cond, uncond, guidance_scale)
    sol = _Solver(ns=ns, eps_fn=eps_fn, batch=x.shape[0],
                  pp=(algorithm_type == "dpmsolver++"))

    if method in ("singlestep", "singlestep_fixed"):
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
                x = sol.second_update(x, s, t, r1=float((lam[1] - lam[0]) / h))
            else:
                x = sol.third_update(x, s, t,
                                     r1=float((lam[1] - lam[0]) / h),
                                     r2=float((lam[2] - lam[0]) / h))
        return x

    if method == "multistep":
        assert steps >= order
        ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
        t_prev: List[float] = [float(ts[0])]
        m_prev: List[Array] = [sol.model(x, float(ts[0]))]
        for step in range(1, order):
            t = float(ts[step])
            x = _ms_update(sol, x, m_prev, t_prev, t, step)
            t_prev.append(t)
            m_prev.append(sol.model(x, t))
        for step in range(order, steps + 1):
            t = float(ts[step])
            step_order = (min(order, steps + 1 - step)
                          if lower_order_final and steps < 10 else order)
            x = _ms_update(sol, x, m_prev, t_prev, t, step_order)
            t_prev = t_prev[1:] + [t] if len(t_prev) >= order else t_prev + [t]
            if step < steps:
                m_new = sol.model(x, t)
                m_prev = (m_prev[1:] + [m_new] if len(m_prev) >= order
                          else m_prev + [m_new])
        return x

    raise ValueError(method)


def _ms_update(sol: _Solver, x, m_prev, t_prev, t: float, order: int):
    if order == 1:
        return sol.first_update(x, t_prev[-1], t, model_s=m_prev[-1])
    if order == 2:
        return sol.multistep_second(x, m_prev[-1], m_prev[-2],
                                    t_prev[-2], t_prev[-1], t)
    return sol.multistep_third(x, m_prev[-1], m_prev[-2], m_prev[-3],
                               t_prev[-3], t_prev[-2], t_prev[-1], t)
