from qdiffusion_tpu.ops.qlayers import (  # noqa: F401
    LayerQuantConfig,
    qconv2d,
    qdense,
    qconv1d,
)
