"""CLI smoke test: make-cali-data -> calibrate -> sample on a tiny task."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from qdiffusion_tpu import config as qconfig
from qdiffusion_tpu import cli
from qdiffusion_tpu.config import SamplerConfig, ScheduleConfig, TaskConfig
from qdiffusion_tpu.models.unet_ddim import DDIMUNetConfig

TINY_TASK = TaskConfig(
    name="tiny", family="pixel",
    schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 100),
    sampler=SamplerConfig("generalized", 8, "uniform", 0.0),
    image_size=8, channels=3,
    unet_ddim=DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(), resolution=8))


@pytest.fixture(autouse=True)
def tiny_preset(monkeypatch):
    monkeypatch.setitem(qconfig.PRESETS, "tiny", TINY_TASK)


def test_full_cli_flow(tmp_path):
    traj = tmp_path / "traj.npz"
    cli.main(["make-cali-data", "--task", "tiny", "--n", "4",
              "--out", str(traj)])
    assert traj.exists()
    from qdiffusion_tpu.schedules import make_skip_sequence

    d = np.load(traj)
    assert d["xs"].shape[0] == len(make_skip_sequence(100, 8, "uniform"))

    logdir = tmp_path / "logs"
    cli.main(["calibrate", "--task", "tiny", "--cali-data", str(traj),
              "--weight-bit", "4", "--quant-act", "--act-bit", "8",
              "--split", "--cali-st", "4", "--cali-n", "4",
              "--cali-batch-size", "4", "--cali-iters", "8",
              "--cali-iters-a", "4", "--logdir", str(logdir)])
    runs = list(logdir.glob("calib-tiny-*"))
    assert runs, "calibration run dir missing"
    qstate_path = runs[0] / "qstate.npz"
    assert qstate_path.exists()
    assert (runs[0] / "sampling_config.json").exists()

    out = tmp_path / "samples"
    cli.main(["sample", "--task", "tiny", "--qstate", str(qstate_path),
              "--weight-bit", "4", "--quant-act", "--split",
              "--engine", "int8", "--n", "4", "--batch", "4",
              "--out", str(out)])
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 4

    # fold engine (weight-only deploy) reuses the same calibrated state
    out2 = tmp_path / "samples_fold"
    cli.main(["sample", "--task", "tiny", "--qstate", str(qstate_path),
              "--weight-bit", "4", "--split",
              "--engine", "fold", "--n", "2", "--batch", "2",
              "--out", str(out2)])
    assert len(list(out2.glob("*.png"))) == 2


def test_sample_npz_dump(tmp_path):
    """--npz-out writes the reference's bulk uint8 dump
    (sample_diffusion_ldm.py:160-164 NxHxWxC-samples.npz)."""
    out = tmp_path / "imgs"
    cli.main(["sample", "--task", "tiny", "--n", "3", "--batch", "2",
              "--out", str(out), "--npz-out", str(tmp_path / "np")])
    files = list((tmp_path / "np").glob("*-samples.npz"))
    assert len(files) == 1 and files[0].name == "3x8x8x3-samples.npz"
    arr = np.load(files[0])["arr_0"]
    assert arr.shape == (3, 8, 8, 3) and arr.dtype == np.uint8


def test_sample_dp_flag(tmp_path):
    """--dp shards the sampling batch over the 8 virtual devices."""
    out = tmp_path / "dp_samples"
    cli.main(["sample", "--task", "tiny", "--n", "8", "--batch", "8",
              "--dp", "--out", str(out)])
    assert len(list(out.glob("*.png"))) == 8


def test_convert_torch_checkpoint(tmp_path):
    """convert: reference torch state_dict -> native npz, then sample from
    the converted file."""
    torch = pytest.importorskip("torch")
    import sys

    ref_path = Path("/root/reference")
    if not ref_path.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(ref_path))
    import types

    from ddim.models.diffusion import Model

    cfg = TINY_TASK.unet_ddim
    ns = lambda **kw: types.SimpleNamespace(**kw)
    config = ns(
        model=ns(type="simple", in_channels=3, out_ch=3, ch=cfg.ch,
                 ch_mult=list(cfg.ch_mult), num_res_blocks=cfg.num_res_blocks,
                 attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
                 resamp_with_conv=True),
        data=ns(image_size=cfg.resolution),
        diffusion=ns(num_diffusion_timesteps=100), split_shortcut=False)
    torch.manual_seed(0)
    m = Model(config)
    ckpt = tmp_path / "fp.pth"
    torch.save(m.state_dict(), ckpt)

    out = tmp_path / "params.npz"
    cli.main(["convert", "--task", "tiny", "--ckpt", str(ckpt),
              "--out", str(out)])
    assert out.exists()

    samples = tmp_path / "converted_samples"
    cli.main(["sample", "--task", "tiny", "--ckpt", str(out),
              "--n", "2", "--batch", "2", "--out", str(samples)])
    assert len(list(samples.glob("*.png"))) == 2
