"""Dry-run of the full 50k-FID validation protocol (docs/VALIDATE.md).

Chains the EXACT CLI commands the runbook prescribes — make-cali-data ->
calibrate -> sample --npz-out -> fid --save-stats -> fid --ref-stats — on
fixture artifacts (tiny preset, random weights, random-weight fixture
pt_inception), so the day real checkpoints + pt_inception appear the
protocol is one command per step with no untested flags.
Reference protocol: 50k samples scored with one extractor
(/root/reference/README.md:103, sample_diffusion_ddim.py:412)."""

import json

import numpy as np
import pytest

from qdiffusion_tpu import cli
from qdiffusion_tpu import config as qconfig

from test_cli import TINY_TASK

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def tiny_preset(monkeypatch):
    monkeypatch.setitem(qconfig.PRESETS, "tiny", TINY_TASK)


@pytest.fixture(scope="module")
def inception_ckpt(tmp_path_factory):
    """Random-weight pt_inception fixture via the independent torch mirror
    (test_inception.py) — same file format as the real artifact."""
    from test_inception import TorchFIDInception

    torch.manual_seed(0)
    m = TorchFIDInception()
    for mod in m.modules():
        if hasattr(mod, "running_mean"):
            mod.running_mean.normal_(0, 0.02)
            mod.running_var.uniform_(0.8, 1.2)
    path = tmp_path_factory.mktemp("fixtures") / "pt_inception.pth"
    torch.save(m.state_dict(), path)
    return path


def test_full_protocol_dry_run(tmp_path, inception_ckpt, capsys):
    # 1. calibration trajectories
    traj = tmp_path / "traj.npz"
    cli.main(["make-cali-data", "--task", "tiny", "--n", "4",
              "--out", str(traj)])

    # 2. calibrate W4A8
    logdir = tmp_path / "logs"
    cli.main(["calibrate", "--task", "tiny", "--cali-data", str(traj),
              "--weight-bit", "4", "--quant-act", "--act-bit", "8",
              "--cali-st", "4", "--cali-n", "4", "--cali-batch-size", "4",
              "--cali-iters", "4", "--cali-iters-a", "2",
              "--logdir", str(logdir)])
    qstate = next(logdir.glob("calib-tiny-*")) / "qstate.npz"
    assert qstate.exists()

    # 3. sample with the bulk uint8 npz dump (the 50k protocol's format)
    out = tmp_path / "samples"
    npz = tmp_path / "w4a8.npz"
    cli.main(["sample", "--task", "tiny", "--qstate", str(qstate),
              "--engine", "fold", "--n", "4", "--out", str(out),
              "--npz-out", str(npz)])
    dumped = np.load(npz)
    imgs = dumped[dumped.files[0]]
    assert imgs.dtype == np.uint8 and imgs.shape[0] == 4

    # 4a. reference statistics (here: the FP samples pose as the ref set)
    ref_npz = tmp_path / "ref.npz"
    cli.main(["sample", "--task", "tiny", "--n", "4",
              "--out", str(tmp_path / "ref_png"), "--npz-out", str(ref_npz)])
    stats = tmp_path / "ref_stats.npz"
    cli.main(["fid", "--set1", str(ref_npz), "--set2", str(ref_npz),
              "--save-stats", str(stats), "--inception", str(inception_ckpt),
              "--batch", "4"])
    self_fid = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(self_fid["fid"]) < 1.0  # identical sets ~0
    saved = np.load(stats)
    assert saved["mu"].shape == (2048,) and saved["sigma"].shape == (2048, 2048)

    # 4b. score quantized samples against the precomputed statistics
    cli.main(["fid", "--set1", str(npz), "--ref-stats", str(stats),
              "--inception", str(inception_ckpt), "--batch", "4"])
    scored = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(scored["fid"]) and scored["n1"] == 4


def test_fid_arg_validation(tmp_path, inception_ckpt):
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main(["fid", "--set1", "x.npz",
                  "--inception", str(inception_ckpt)])
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main(["fid", "--set1", "x.npz", "--set2", "y.npz",
                  "--ref-stats", "s.npz",
                  "--inception", str(inception_ckpt)])
