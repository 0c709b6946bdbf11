from qdiffusion_tpu.quant.affine import (  # noqa: F401
    AffineQuantizerSpec,
    fake_quant,
    init_scale,
    ema_update,
    round_ste,
    lp_loss,
)
from qdiffusion_tpu.quant.adaround import (  # noqa: F401
    adaround_init_alpha,
    adaround_quant,
    adaround_soft_targets,
)
