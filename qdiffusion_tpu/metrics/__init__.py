from qdiffusion_tpu.metrics.fid import (  # noqa: F401
    compute_statistics,
    frechet_distance,
    fid_from_features,
    inception_score_from_logits,
)
