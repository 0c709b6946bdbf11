"""End-to-end quality evidence: calibration must beat naive rounding on
an output-quality metric, not just on block error (which only shows the
optimizer working — this shows the pipeline paying off).

Runs the miniature of the reference's headline claim
(/root/reference/README.md:5 — AdaRound + block reconstruction keeps FID
close to FP at 4-bit weights): train a tiny DDPM on a procedural
distribution, quantize weights naive vs calibrated, score both with the
in-repo FID over fixture features. Deterministic (fixed seeds, CPU),
so the assertion is a regression gate for the calibration engine, the
capture machinery, and the reconstruction optimizer together.

Settings are the smallest that pass with wide margins, found by an
on-chip scan (docs/E2E_RUN.md quality-evidence table): smaller configs
leave the FP model undertrained, and FID ordering at that point is
estimator noise (measured: 1000 train steps gives fid_fp 1.40 with naive
W4 scoring BETTER than FP). At these settings the run costs ~7 min on
the TPU chip but tens of minutes on this box's single CPU core, so the
test is opt-in: QDT_QUALITY_E2E=1 python -m pytest
tests/test_quality_evidence.py. scripts/quality_evidence.py is the full
protocol whose numbers are recorded in docs/E2E_RUN.md.
"""

import importlib.util
import os
import sys
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "quality_evidence",
    Path(__file__).resolve().parent.parent / "scripts"
    / "quality_evidence.py")
qe = importlib.util.module_from_spec(_SPEC)
sys.modules["quality_evidence"] = qe
_SPEC.loader.exec_module(qe)


@pytest.mark.fullsize
@pytest.mark.skipif(not os.environ.get("QDT_QUALITY_E2E"),
                    reason="tens of minutes on 1 CPU core; set "
                           "QDT_QUALITY_E2E=1 (validated on chip: "
                           "docs/E2E_RUN.md quality-evidence table)")
def test_calibrated_w4_beats_naive_w4_on_fid():
    out = qe.run_protocol(train_steps=2500, n_samples=384, recon_iters=1000,
                          bits=4, sample_steps=50, cali_n=48, cali_st=5,
                          seed=0, log=lambda *a: None, act_quant=True)
    # sanity: the model learned something (FP close to the data) and 4-bit
    # nearest rounding measurably hurts (chip run: fp 0.14, naive 1.84)
    assert out["fid_naive"] > 3 * out["fid_fp"], out
    # the claim: calibration recovers most of the naive-W4 quality gap
    # (chip run: calib 0.50, recovered_frac 0.79; margins are wide enough
    # to transfer across backends' numerics)
    assert out["fid_calib"] < out["fid_naive"] * 0.5, out
    assert out["recovered_frac"] > 0.4, out
    # W4A8 arm (the reference's headline config shape): the fully
    # calibrated act-quant model must beat the naive W4A8 init and stay
    # in the same quality regime as calibrated weight-only (chip round-5
    # run: docs/E2E_RUN.md quality-evidence table)
    assert out["fid_calib_a8"] < out["fid_naive_a8"], out
    assert out["fid_calib_a8"] < out["fid_naive"] * 0.6, out
