"""Invisible watermark: round-trip, invisibility, PNG survival, CLI wire.

Reference stamps SD outputs via the external invisible-watermark package
(txt2img.py:493-495, 560-584); ours is an in-repo equivalent with a
decoder (the reference ships none).
"""

import io

import numpy as np
import pytest

from qdiffusion_tpu.utils.watermark import (
    bits_to_text,
    embed_watermark,
    extract_watermark,
    text_to_bits,
)


def _img(h=256, w=256, seed=0):
    rng = np.random.default_rng(seed)
    # smooth natural-ish image: random low-freq + noise
    base = rng.normal(size=(h // 16, w // 16, 3))
    up = np.kron(base, np.ones((16, 16, 1)))
    img = 128 + 40 * up + rng.normal(size=(h, w, 3)) * 8
    return np.clip(img, 0, 255).astype(np.uint8)


def test_bits_roundtrip():
    assert bits_to_text(text_to_bits("SDV2")) == "SDV2"


def test_embed_extract_roundtrip():
    img = _img()
    out = embed_watermark(img, "QDT!")
    assert out.shape == img.shape and out.dtype == np.uint8
    assert extract_watermark(out, 4) == "QDT!"


def test_invisibility():
    img = _img(seed=1)
    out = embed_watermark(img, "QDT!")
    diff = np.abs(out.astype(np.int32) - img.astype(np.int32))
    assert diff.mean() < 4.0 and diff.max() <= 48  # chroma-only nudges


def test_survives_png_roundtrip(tmp_path):
    from PIL import Image

    img = _img(seed=2)
    out = embed_watermark(img, "QDT!")
    buf = io.BytesIO()
    Image.fromarray(out).save(buf, format="PNG")
    back = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    assert extract_watermark(back, 4) == "QDT!"


def test_unwatermarked_image_decodes_noise():
    img = _img(seed=3)
    got = extract_watermark(img, 4)
    assert got != "QDT!"


def test_cli_watermark_flag(tmp_path, monkeypatch):
    """sample --watermark stamps every PNG (reference txt2img.py:560-584)."""
    import jax
    from PIL import Image

    from qdiffusion_tpu import cli
    from qdiffusion_tpu import config as qconfig
    from qdiffusion_tpu.config import SamplerConfig, ScheduleConfig, TaskConfig
    from qdiffusion_tpu.models.unet_ddim import DDIMUNetConfig

    # 128px -> 16 QIM votes per payload bit; 64px leaves only 4, too few
    # for a pure-noise image (untrained tiny UNet output)
    tiny = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), resolution=128)
    task = TaskConfig(
        name="tiny-wm", family="pixel",
        schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 50),
        sampler=SamplerConfig("generalized", 2, "uniform", 0.0),
        image_size=128, channels=3, unet_ddim=tiny)
    monkeypatch.setitem(qconfig.PRESETS, "tiny-wm", task)

    out = tmp_path / "imgs"
    cli.main(["sample", "--task", "tiny-wm", "--n", "1", "--batch", "1",
              "--watermark", "QDT!", "--out", str(out)])
    files = list(out.glob("*.png"))
    assert len(files) == 1
    img = np.asarray(Image.open(files[0]))
    assert extract_watermark(img, 4) == "QDT!"
