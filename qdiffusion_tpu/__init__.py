"""qdiffusion_tpu — TPU-native post-training quantization for diffusion models.

A JAX/XLA/Pallas re-design of the Q-Diffusion PTQ framework
(reference: Xiuyu-Li/q-diffusion, ICCV 2023). Capabilities:

  * Uniform affine fake quantization (per-tensor / per-channel, symmetric /
    asymmetric / always-zero) with min-max and MSE (LAPQ-style) scale init.
  * AdaRound adaptive rounding learned by block-wise output reconstruction.
  * Split-shortcut quantization of UNet skip-connection concat inputs.
  * Timestep-aware calibration data collection from sampling trajectories.
  * DDIM / DDPM / PLMS / DPM-Solver samplers as fully-jitted lax.scan loops.
  * Model zoo: CIFAR-10 pixel-space UNet, LDM/Stable-Diffusion UNet,
    VAE decoders, CLIP text conditioning.
  * Real int8 TPU inference kernels (Pallas + XLA int8 dot) — the reference
    only simulates quantization in fp32.
  * Data-parallel sampling and calibration over a `jax.sharding.Mesh`.

Everything is a pytree: model parameters, quantizer state (delta, zero-point,
AdaRound alpha), and sampler schedules. There is no in-place module surgery,
no forward hooks, and no Parameter-promotion checkpoint dance.
"""

__version__ = "0.1.0"

from qdiffusion_tpu.quant.affine import (  # noqa: F401
    AffineQuantizerSpec,
    fake_quant,
    init_scale,
)
