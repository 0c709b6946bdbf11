"""Run-directory observability: timestamped logdirs, file+stream logging,
config dump, throughput lines — parity with the reference's per-run logging
(sample_diffusion_ddim.py:505-529, txt2img.py:341-355, ldm.py:414-444 and
the sampling_config.yaml dumps / images-per-sec log lines)."""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from datetime import datetime
from pathlib import Path
logger = logging.getLogger(__name__)


def setup_run_dir(base: str, tag: str = "run", path=None) -> Path:
    """`path` pins an EXACT run directory (calibration crash-resume: the
    CalibCheckpointer snapshots live in the original run dir, so resuming
    must reuse it — reference temp-ckpt reuse, txt2img.py:422-428)."""
    run_dir = (Path(path) if path
               else Path(base) / f"{tag}-{datetime.now():%Y-%m-%d-%H-%M-%S}")
    run_dir.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(run_dir / "run.log")
    handler.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
    root = logging.getLogger()
    root.addHandler(handler)
    if not any(isinstance(h, logging.StreamHandler)
               and not isinstance(h, logging.FileHandler)
               for h in root.handlers):
        root.addHandler(logging.StreamHandler())
    root.setLevel(logging.INFO)
    return run_dir


def dump_config(run_dir: Path, config, name: str = "sampling_config.json"):
    def enc(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, Path):
            return str(o)
        return repr(o)

    (run_dir / name).write_text(json.dumps(config, default=enc, indent=2))


class Throughput:
    """Wall-clock images/sec logger (reference ldm.py:126-133)."""

    def __init__(self):
        self.t0 = time.time()

    def log(self, n_images: int, what: str = "sampling") -> float:
        dt = time.time() - self.t0
        tput = n_images / dt
        logger.info("Throughput for this batch: %.3f images/s (%s, %d imgs "
                    "in %.1fs)", tput, what, n_images, dt)
        self.t0 = time.time()
        return tput


def save_images_png(images, out_dir: Path, start_idx: int = 0,
                    prefix: str = "") -> int:
    """images: (N, H, W, C) float [0,1] -> PNG files; returns next index."""
    from PIL import Image
    import numpy as np

    out_dir.mkdir(parents=True, exist_ok=True)
    arr = (np.asarray(images) * 255.0).round().astype("uint8")
    for i, im in enumerate(arr):
        Image.fromarray(im.squeeze()).save(
            out_dir / f"{prefix}{start_idx + i:06}.png")
    return start_idx + len(arr)


def encode_png(image) -> bytes:
    """One (H, W, C) image (uint8, or float in [0,1]) -> PNG bytes."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr.squeeze()).save(buf, format="PNG")
    return buf.getvalue()


def save_npz(images, path: Path):
    import numpy as np

    np.savez(path, np.asarray(images))
