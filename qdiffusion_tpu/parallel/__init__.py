from qdiffusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    dp_sample,
    dp_recon_step,
)
