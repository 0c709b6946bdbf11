"""Calibration engine: capture consistency, reconstruction improvement,
end-to-end tiny calibrate->sample smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdiffusion_tpu.calib.capture import capture_unit_io
from qdiffusion_tpu.calib.engine import (
    CalibConfig,
    calibrate,
    init_act_qstate,
    init_weight_qstate,
)
from qdiffusion_tpu.calib.recon import ReconConfig, reconstruct_unit
from qdiffusion_tpu.calib.samples import get_train_samples
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode
from qdiffusion_tpu.samplers.ddim import ddim_sample
from qdiffusion_tpu.schedules import get_beta_schedule, make_skip_sequence

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)

W4_POLICY = QuantPolicy(
    wq=AffineQuantizerSpec(n_bits=4, channel_wise=True, channel_axis=-1,
                           scale_method="max"),
    aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True),
)


@pytest.fixture(scope="module")
def setup():
    model = DDIMUNet(TINY, W4_POLICY)
    params = model.init_params(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
    ts = jnp.asarray(np.linspace(0, 999, 16), jnp.float32)
    return model, params, xs, ts


def test_weight_qstate_init_split_aware(setup):
    model, params, *_ = setup
    qstate = init_weight_qstate(model, params)
    assert "conv_in" in qstate and "w" in qstate["conv_in"]
    # per-out-channel deltas for conv weights, channel on last axis
    assert qstate["conv_in"]["w"]["delta"].shape == (1, 1, 1, 32)


def test_capture_consistency(setup):
    model, params, xs, ts = setup
    qstate = init_weight_qstate(model, params)
    unit = next(u for u in model.units if u.name == "mid.block_1")
    inps, out = capture_unit_io(model, params, qstate, unit.name, xs, ts,
                                asym=False, batch_size=8)
    assert len(inps) == 2  # (x, temb)
    assert out.shape[0] == 16
    # replaying the block on captured inputs reproduces the captured output
    ctx = QuantCtx(qstate, mode=QuantMode.off())
    replay = unit.apply(params, ctx, inps[0][:4], inps[1][:4])
    np.testing.assert_allclose(np.asarray(replay), np.asarray(out[:4]),
                               rtol=1e-4, atol=1e-5)


def test_asym_capture_differs_under_quant(setup):
    model, params, xs, ts = setup
    qstate = init_weight_qstate(model, params)
    unit = next(u for u in model.units if u.name == "mid.block_1")
    inps_fp, _ = capture_unit_io(model, params, qstate, unit.name, xs, ts,
                                 asym=False, batch_size=8)
    inps_q, _ = capture_unit_io(model, params, qstate, unit.name, xs, ts,
                                asym=True, batch_size=8)
    # W4 prefix perturbs the block input
    d = float(jnp.mean(jnp.abs(inps_fp[0] - inps_q[0])))
    assert d > 1e-6


def test_reconstruction_reduces_block_error(setup):
    model, params, xs, ts = setup
    qstate = init_weight_qstate(model, params)
    unit = next(u for u in model.units if u.name == "down.0.block.0")
    inps, out = capture_unit_io(model, params, qstate, unit.name, xs, ts,
                                asym=True, batch_size=8)

    def block_mse(q, soft):
        ctx = QuantCtx(q, mode=QuantMode(w=True, a=False, soft=soft))
        pred = unit.apply(params, ctx, *inps)
        return float(jnp.mean((pred - out) ** 2))

    before = block_mse(qstate, soft=False)  # nearest rounding
    cfg = ReconConfig(iters=256, batch_size=8, warmup=0.2)
    q2 = reconstruct_unit(model, params, qstate, unit, inps, out, cfg,
                          act_quant=False, rng=jax.random.PRNGKey(2))
    after = block_mse(q2, soft=False)  # hard adaround after optimization
    assert "alpha" in q2[f"{unit.name}.conv1"]["w"]
    assert after < before * 1.02  # must not regress; normally improves
    assert after < before  # adaround should beat nearest on W4


def test_end_to_end_tiny_calibration_and_sampling(setup):
    model, params, *_ = setup
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = make_skip_sequence(100, 8, "uniform")

    def fp_model(x, t):
        return model.apply(params, x, t)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3))
    _, traj = ddim_sample(fp_model, x0, seq, betas, eta=0.0,
                          return_trajectory=True)
    cali = get_train_samples(traj, cali_n=4, cali_st=4)
    nsteps = traj["xs"].shape[0]
    n_slices = len(range(0, nsteps, nsteps // 4))
    assert cali[0].shape[0] == n_slices * 4

    cfg = CalibConfig(
        weight=ReconConfig(iters=24, batch_size=4),
        act=ReconConfig(iters=12, batch_size=4, lr=4e-4, p=2.4),
        quant_act=True, running_stat=True, capture_batch=4, act_init_batch=8)
    qstate = calibrate(model, params, cali, cfg, rng=jax.random.PRNGKey(4))

    # quantized sampler runs end to end and stays close to FP
    ctx_mode = QuantMode(w=True, a=True, soft=False)

    def q_model(x, t):
        return model.apply(params, x, t, QuantCtx(qstate, mode=ctx_mode))

    xq, _ = ddim_sample(q_model, x0, seq, betas, eta=0.0)
    xf, _ = ddim_sample(fp_model, x0, seq, betas, eta=0.0)
    assert np.isfinite(np.asarray(xq)).all()
    rel = float(jnp.linalg.norm(xq - xf) / jnp.linalg.norm(xf))
    assert rel < 0.5  # W4A8 tiny-calib sanity bound


def test_pipelined_calibration_matches_synchronous(setup):
    """cfg.pipeline only removes host syncs (overlapping unit N+1's
    trace/compile with unit N's device execution) — the calibrated qstate
    must be bit-identical to the synchronous schedule."""
    model, params, *_ = setup
    xs = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 16, 3))
    ts = jnp.tile(jnp.array([100.0, 500.0]), 4)
    base = dict(weight=ReconConfig(iters=16, batch_size=4),
                act=ReconConfig(iters=8, batch_size=4, lr=4e-4, p=2.4),
                quant_act=True, capture_batch=4, act_init_batch=8)
    q_sync = calibrate(model, params, (xs, ts),
                       CalibConfig(pipeline=False, **base),
                       rng=jax.random.PRNGKey(6))
    q_pipe = calibrate(model, params, (xs, ts),
                       CalibConfig(pipeline=True, **base),
                       rng=jax.random.PRNGKey(6))
    flat_s, tdef_s = jax.tree_util.tree_flatten(q_sync)
    flat_p, tdef_p = jax.tree_util.tree_flatten(q_pipe)
    assert tdef_s == tdef_p
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
