"""Resumable calibration: crash mid-pass, resume from the snapshot.

Covers CalibCheckpointer + the engine's ckpt_every cadence (each phase
writes one full-base snapshot at unit-loop entry — before capture
buffers are live, the round-4 SD OOM site — and every in-loop snapshot
is a site increment). Reference behavior being replaced:
mid-calibration temp checkpoints, txt2img.py:422-428."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.calib import engine as engine_mod
from qdiffusion_tpu.calib.engine import CalibConfig, calibrate
from qdiffusion_tpu.calib.recon import ReconConfig
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.utils.checkpoints import CalibCheckpointer

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), resolution=16)


def _setup():
    policy = QuantPolicy(
        wq=AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                               scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True))
    model = DDIMUNet(TINY, policy)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    ts = jnp.asarray(np.linspace(0, 99, 8).astype(np.float32))
    cfg = CalibConfig(weight=ReconConfig(iters=4, batch_size=4),
                      act=ReconConfig(iters=2, batch_size=4, lr=4e-4),
                      quant_act=True, capture_batch=4, act_init_batch=8,
                      ckpt_every=2)
    return model, params, xs, ts, cfg


def test_crash_and_resume(tmp_path, monkeypatch):
    model, params, xs, ts, cfg = _setup()
    n_units = len(model.units)
    assert n_units >= 4

    real_recon = engine_mod.reconstruct_unit
    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 5:
            raise RuntimeError("simulated crash")
        return real_recon(*a, **kw)

    ckptr = CalibCheckpointer(tmp_path)
    monkeypatch.setattr(engine_mod, "reconstruct_unit", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        calibrate(model, params, (xs, ts), cfg, rng=jax.random.PRNGKey(1),
                  checkpointer=ckptr)
    # a snapshot exists at the ckpt_every cadence
    assert (tmp_path / "qstate_wip.npz").exists()
    assert (tmp_path / "calib_progress.json").exists()

    monkeypatch.setattr(engine_mod, "reconstruct_unit", real_recon)
    calls2 = {"n": 0}

    def counting(*a, **kw):
        calls2["n"] += 1
        return real_recon(*a, **kw)

    monkeypatch.setattr(engine_mod, "reconstruct_unit", counting)
    qstate = calibrate(model, params, (xs, ts), cfg,
                       rng=jax.random.PRNGKey(1), checkpointer=ckptr)
    # resume skipped the snapshotted units (did fewer than a full 2-pass
    # run would) but completed the rest
    full_calls = 2 * n_units
    assert calls2["n"] < full_calls
    assert not (tmp_path / "calib_progress.json").exists()  # finalized
    assert (tmp_path / "qstate.npz").exists()
    # every unit ended reconstructed: alphas on weights, deltas on acts
    for unit in model.units:
        for ln in unit.layer_names:
            assert "alpha" in qstate[ln]["w"], ln
            assert "a" in qstate[ln], ln

def test_bf16_alpha_storage(tmp_path):
    """alpha_dtype='bfloat16' (the SD-scale HBM-residency mode): alphas are
    STORED bf16 end to end — engine output, npz snapshot round-trip — while
    the optimization still moves them (f32 accumulation inside the runner),
    and the calibrated quantized forward stays close to the f32-alpha
    calibration."""
    model, params, xs, ts, cfg = _setup()
    cfg16 = engine_mod.CalibConfig(
        weight=cfg.weight, act=cfg.act, quant_act=True,
        capture_batch=cfg.capture_batch, act_init_batch=cfg.act_init_batch,
        ckpt_every=2, alpha_dtype="bfloat16")

    ckptr = CalibCheckpointer(tmp_path)
    q16 = calibrate(model, params, (xs, ts), cfg16,
                    rng=jax.random.PRNGKey(1), checkpointer=ckptr)
    q32 = calibrate(model, params, (xs, ts),
                    engine_mod.CalibConfig(
                        weight=cfg.weight, act=cfg.act, quant_act=True,
                        capture_batch=cfg.capture_batch,
                        act_init_batch=cfg.act_init_batch),
                    rng=jax.random.PRNGKey(1))

    from qdiffusion_tpu.utils.checkpoints import load_qstate
    reloaded = load_qstate(tmp_path / "qstate.npz")
    for unit in model.units:
        for ln in unit.layer_names:
            a16 = q16[ln]["w"]["alpha"]
            assert a16.dtype == jnp.bfloat16, ln
            assert reloaded[ln]["w"]["alpha"].dtype == jnp.bfloat16, ln
            np.testing.assert_array_equal(np.asarray(a16),
                                          np.asarray(reloaded[ln]["w"]["alpha"]))
            a32 = np.asarray(jnp.asarray(
                q32[ln]["w"]["alpha"], dtype=jnp.float32))
            # hard-rounding masks agree between the two calibrations up to
            # alphas that genuinely straddle zero
            m16 = np.asarray(a16, dtype=np.float32) >= 0
            assert (m16 == (a32 >= 0)).mean() > 0.98, ln

    # quantized forward with bf16-stored alphas tracks the f32 calibration
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    def fwd(q):
        ctx = QuantCtx(q, mode=QuantMode(w=True, a=True, soft=False))
        return model.apply(params, xs[:2], ts[:2], ctx)

    y16, y32 = fwd(q16), fwd(q32)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0.05, atol=5e-3)
