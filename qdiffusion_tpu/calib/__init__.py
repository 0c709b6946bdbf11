from qdiffusion_tpu.calib.samples import get_train_samples  # noqa: F401
from qdiffusion_tpu.calib.engine import calibrate, CalibConfig  # noqa: F401
