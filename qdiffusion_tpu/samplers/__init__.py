from qdiffusion_tpu.samplers.ddim import (  # noqa: F401
    ddim_sample,
    ddpm_sample,
)
