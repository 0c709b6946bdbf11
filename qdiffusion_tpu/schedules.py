"""Diffusion noise schedules and timestep-subsequence selection.

Pure NumPy/JAX table construction; everything returned is a static array
precomputed once on the host, so samplers can close over the tables and jit.

Behavioral parity targets (semantics re-derived, not copied):
  * DDPM-side beta schedules: reference scripts/sample_diffusion_ddim.py:37-67
    (quad / linear / const / jsd / sigmoid).
  * LDM-side beta schedules: reference ldm/modules/diffusionmodules/util.py:21-43
    (linear=sqrt-space linspace**2, cosine, sqrt_linear, sqrt).
  * DDIM timestep subsequences: uniform / quad, both the script variant
    (sample_diffusion_ddim.py:290-301, 0-based) and the LDM variant
    (util.py:46-60, +1 shifted).
  * DDIM sigma/alpha tables: util.py:63-74.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

__all__ = [
    "get_beta_schedule",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "make_skip_sequence",
    "NoiseSchedule",
]


def get_beta_schedule(
    beta_schedule: str,
    *,
    beta_start: float,
    beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """DDPM-lineage beta schedules (float64, shape [T]).

    Variants: "quad" (linspace in sqrt-space, squared), "linear", "const",
    "jsd" (1/T..1), "sigmoid" (logistic ramp between beta_start and beta_end).
    """
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """LDM-lineage beta schedules (float64, shape [T]).

    Note the naming quirk inherited from the LDM lineage: "linear" here is the
    sqrt-space schedule (== the DDPM lineage's "quad"), and "sqrt_linear" is a
    plain linspace.
    """
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_skip_sequence(num_timesteps: int, timesteps: int, skip_type: str = "uniform"):
    """Timestep subsequence used by the pixel-space DDIM/DDPM samplers.

    Matches reference sample_diffusion_ddim.py:290-301: "uniform" strides by
    floor(T/steps) starting at 0; "quad" squares a linspace to sqrt(0.8 T).
    Returns a Python list of ints in increasing order.
    """
    if skip_type == "uniform":
        skip = num_timesteps // timesteps
        seq = list(range(0, num_timesteps, skip))
    elif skip_type == "quad":
        seq = np.linspace(0, np.sqrt(num_timesteps * 0.8), timesteps) ** 2
        seq = [int(s) for s in seq]
    else:
        raise NotImplementedError(skip_type)
    return seq


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """LDM-lineage DDIM subsequence (+1 shifted; reference util.py:46-60)."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(ddim_discr_method)
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-step (sigma, alpha, alpha_prev) tables for the LDM DDIM sampler."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed diffusion tables shared by all samplers.

    betas: [T] float64; alphas_cumprod: [T]; plus the padded cumprod used by
    the pixel-space DDIM update (compute_alpha semantics: index t+1 into a
    zero-prepended beta cumprod, reference ddim/functions/denoising.py:4-7).
    """

    betas: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas, axis=0)

    @property
    def alphas_cumprod_padded(self) -> np.ndarray:
        """cumprod of (1-beta) with a leading 1.0 so index t+1 == a(t)."""
        return np.cumprod(1.0 - np.concatenate([np.zeros(1), self.betas]), axis=0)

    @classmethod
    def ddpm(cls, beta_schedule: str, beta_start: float, beta_end: float, T: int):
        return cls(
            get_beta_schedule(
                beta_schedule,
                beta_start=beta_start,
                beta_end=beta_end,
                num_diffusion_timesteps=T,
            )
        )

    @classmethod
    def ldm(cls, schedule: str, T: int, linear_start: float, linear_end: float,
            cosine_s: float = 8e-3):
        return cls(
            make_beta_schedule(schedule, T, linear_start, linear_end, cosine_s)
        )
