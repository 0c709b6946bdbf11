"""Checkpoint auto-download registry.

Equivalent of the reference's get_ckpt_path (ddim/functions/ckpt_util.py:
55-72): a name -> (URL, MD5) map for the converted pesser/pytorch_diffusion
DDPM checkpoints, with MD5-verified download. Network egress may be
unavailable in air-gapped deployments — the resolver prefers an existing
local file and raises a clear error otherwise.
"""

from __future__ import annotations

import hashlib
import logging
from pathlib import Path
logger = logging.getLogger(__name__)

_BASE = "https://heibox.uni-heidelberg.de/f/{}/?dl=1"

CKPT_URLS = {
    "cifar10": _BASE.format("869980b53bf5416c9e64"),
    "ema_cifar10": _BASE.format("2e4f01e2d9ee49bab1d5"),
    "lsun_bedroom": _BASE.format("f2e22f5f8bb94f12aaf3"),
    "ema_lsun_bedroom": _BASE.format("b95206528f384185889b"),
    "lsun_cat": _BASE.format("fac870bd988348eab88e"),
    "ema_lsun_cat": _BASE.format("0701aac3aa69457bbe34"),
    "lsun_church": _BASE.format("2711a6f712e744318bb8"),
    "ema_lsun_church": _BASE.format("44f985466d13e6b2e2a9"),
}

# CLIP tokenizer artifacts for SD prompts (models/clip_tokenizer.py): the
# two files HF ships for openai/clip-vit-large-patch14. Pass their directory
# to the CLI as --tokenizer-dir.
TOKENIZER_URLS = {
    "vocab.json": ("https://huggingface.co/openai/clip-vit-large-patch14/"
                   "resolve/main/vocab.json"),
    "merges.txt": ("https://huggingface.co/openai/clip-vit-large-patch14/"
                   "resolve/main/merges.txt"),
}

CKPT_MD5 = {
    "cifar10": "82ed3067fd1002f5cf4c339fb80c4669",
    "ema_cifar10": "1fa350b952534ae442b1d5235cce5cd3",
    "lsun_bedroom": "f70280ac0e08b8e696f42cb8e948ff1c",
    "ema_lsun_bedroom": "1921fa46b66a3665e450e42f36c2720f",
    "lsun_cat": "bbee0e7c3d7abfb6e2539eaf2fb9987b",
    "ema_lsun_cat": "646f23f4821f2459b8bafc57fd824558",
    "lsun_church": "eb619b8a5ab95ef80f94ce8a5488dae3",
    "ema_lsun_church": "fdc68a23938c2397caba4a260bc2445f",
}


def md5_of(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def get_ckpt_path(name: str, root: str = "ckpts",
                  check_md5: bool = False) -> Path:
    """Resolve (and if necessary download) a named FP checkpoint."""
    if name.startswith("ema_"):
        fname = f"{name}.ckpt"
    else:
        fname = f"{name}.ckpt"
    path = Path(root) / fname
    if path.exists():
        if check_md5 and name in CKPT_MD5 and md5_of(path) != CKPT_MD5[name]:
            raise ValueError(f"MD5 mismatch for {path}")
        return path
    if name not in CKPT_URLS:
        raise KeyError(f"unknown checkpoint '{name}'; known: {sorted(CKPT_URLS)}")
    url = CKPT_URLS[name]
    logger.info("downloading %s from %s", name, url)
    try:
        import urllib.request

        path.parent.mkdir(parents=True, exist_ok=True)
        urllib.request.urlretrieve(url, path)  # nosec: pinned registry URL
    except Exception as e:
        raise RuntimeError(
            f"cannot download {name} ({e}); place the file at {path} "
            "manually (air-gapped environment?)") from e
    if check_md5 and name in CKPT_MD5 and md5_of(path) != CKPT_MD5[name]:
        raise ValueError(f"MD5 mismatch after download for {path}")
    return path
