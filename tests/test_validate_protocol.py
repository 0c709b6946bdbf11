"""Dry-run of the full 50k-FID validation protocol (docs/VALIDATE.md).

Chains the EXACT CLI commands the runbook prescribes — make-cali-data ->
calibrate -> sample --npz-out -> fid --save-stats -> fid --ref-stats — on
fixture artifacts (tiny preset, random weights, random-weight fixture
pt_inception), so the day real checkpoints + pt_inception appear the
protocol is one command per step with no untested flags.
Reference protocol: 50k samples scored with one extractor
(/root/reference/README.md:103, sample_diffusion_ddim.py:412).

Each step runs as a REAL subprocess CLI invocation — exactly how the
runbook executes (one process per command), and deliberately NOT via an
in-process cli.main() call: XLA:CPU's in-process LLVM compile segfaults
when this test's large calibrate program compiles late in a long pytest
process (reproduced 3x at the same spot; the faulthandler stack shows a
single MAIN-thread jax Lowered.compile() with only tqdm's monitor thread
alive, so it is not a concurrency bug in our AOT precompiler — earlier
lock/inline mitigations changed nothing). The trigger is accumulated
process state: a suite prefix containing test_fullsize_parity (multi-GB
torch+jax full-size SD state) poisons the later compile, while the same
test is green in isolation and after the other half of the suite. Fresh
subprocesses are immune by construction and match the runbook's actual
invocation shape.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from qdiffusion_tpu import cli
from qdiffusion_tpu import config as qconfig

from test_cli import TINY_TASK

torch = pytest.importorskip("torch")

# Full tier: each step is a fresh subprocess that re-pays the jax+torch
# import and its CPU compiles (minutes per test on the 1-core box) — with
# test_fullsize_parity these two files are what pushed the round-4 suite
# to ~1.6 h. Fast tier (default run) covers the same CLI surface
# in-process via test_cli.py / test_cli_sd.py.
pytestmark = pytest.mark.fullsize

TESTS_DIR = Path(__file__).resolve().parent

# Registers the tiny test preset (same as the tiny_preset fixture) in the
# child, then dispatches to the real CLI entry point.
_DRIVER = """\
import json, sys
sys.path.insert(0, sys.argv[1])
from test_cli import TINY_TASK
from qdiffusion_tpu import cli
from qdiffusion_tpu import config as qconfig
qconfig.PRESETS["tiny"] = TINY_TASK
cli.main(json.loads(sys.argv[2]))
"""


def run_cli(cache_dir, args, timeout=1500):
    """One runbook step = one CLI process (conftest's CPU/8-device setup
    passed through the environment, which a fresh interpreter does honor —
    the in-process-too-late caveat only applies to an already-imported
    jax). A shared per-run persistent compile cache deduplicates the
    compiles the in-process jit cache used to share across steps (the two
    sample steps run the same program; the two fid steps share the
    Inception extractor). Returns the step's stdout for JSON parsing."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=str(cache_dir),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.0",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    p = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(TESTS_DIR),
         json.dumps([str(a) for a in args])],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert p.returncode == 0, (
        f"cli {args[0]} rc={p.returncode}\n--- stdout:\n{p.stdout[-3000:]}"
        f"\n--- stderr:\n{p.stderr[-3000:]}")
    return p.stdout


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


def test_full_protocol_dry_run(tmp_path, inception_ckpt):
    cache = tmp_path / "xla_cache"  # shared across the chain's processes

    # 1. calibration trajectories
    traj = tmp_path / "traj.npz"
    run_cli(cache, ["make-cali-data", "--task", "tiny", "--n", "4",
             "--out", traj])

    # 2. calibrate W4A8
    logdir = tmp_path / "logs"
    run_cli(cache, ["calibrate", "--task", "tiny", "--cali-data", traj,
             "--weight-bit", "4", "--quant-act", "--act-bit", "8",
             "--cali-st", "4", "--cali-n", "4", "--cali-batch-size", "4",
             "--cali-iters", "4", "--cali-iters-a", "2",
             "--logdir", logdir])
    qstate = next(logdir.glob("calib-tiny-*")) / "qstate.npz"
    assert qstate.exists()

    # 3. sample with the bulk uint8 npz dump (the 50k protocol's format)
    out = tmp_path / "samples"
    npz = tmp_path / "w4a8.npz"
    run_cli(cache, ["sample", "--task", "tiny", "--qstate", qstate,
             "--engine", "fold", "--n", "4", "--out", out,
             "--npz-out", npz])
    dumped = np.load(npz)
    imgs = dumped[dumped.files[0]]
    assert imgs.dtype == np.uint8 and imgs.shape[0] == 4

    # 4a. reference statistics (here: the FP samples pose as the ref set)
    ref_npz = tmp_path / "ref.npz"
    run_cli(cache, ["sample", "--task", "tiny", "--n", "4",
             "--out", tmp_path / "ref_png", "--npz-out", ref_npz])
    stats = tmp_path / "ref_stats.npz"
    out1 = run_cli(cache, ["fid", "--set1", ref_npz, "--set2", ref_npz,
                    "--save-stats", stats, "--inception", inception_ckpt,
                    "--batch", "4"])
    self_fid = json.loads(out1.strip().splitlines()[-1])
    assert abs(self_fid["fid"]) < 1.0  # identical sets ~0
    saved = np.load(stats)
    assert saved["mu"].shape == (2048,) and saved["sigma"].shape == (2048, 2048)

    # 4b. score quantized samples against the precomputed statistics
    out2 = run_cli(cache, ["fid", "--set1", npz, "--ref-stats", stats,
                    "--inception", inception_ckpt, "--batch", "4"])
    scored = json.loads(out2.strip().splitlines()[-1])
    assert np.isfinite(scored["fid"]) and scored["n1"] == 4


def test_fid_arg_validation(tmp_path, inception_ckpt):
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main(["fid", "--set1", "x.npz",
                  "--inception", str(inception_ckpt)])
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main(["fid", "--set1", "x.npz", "--set2", "y.npz",
                  "--ref-stats", "s.npz",
                  "--inception", str(inception_ckpt)])
