"""GroupedCapture vs per-unit capture_unit_io: identical capture values.

The grouped scheme (calib/capture.py::GroupedCapture) exists purely to
kill the per-unit compile wall; the captured values must match the
reference-semantics per-unit path (qdiff/utils.py:18-149) for every unit,
in both FP and quantized-prefix (asym) modes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.calib.capture import GroupedCapture, capture_unit_io
from qdiffusion_tpu.calib.engine import CalibConfig, calibrate, init_weight_qstate
from qdiffusion_tpu.calib.recon import ReconConfig
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)


@pytest.fixture(scope="module")
def setup():
    policy = QuantPolicy(
        wq=AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                               scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True))
    model = DDIMUNet(TINY, policy)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    ts = jnp.asarray(np.linspace(0, 999, 8).astype(np.float32))
    return model, params, qstate, xs, ts


def test_fp_capture_matches_per_unit(setup):
    model, params, qstate, xs, ts = setup
    names = tuple(u.name for u in model.units if u.layer_names)
    gc = GroupedCapture(model, batch_size=4)
    fp = gc.fp_capture(params, names, xs, ts)
    for name in names:
        inps_ref, out_ref = capture_unit_io(
            model, params, qstate, name, xs, ts, asym=False,
            act_quant=False, batch_size=4)
        inps, out = fp[name]
        assert len(inps) == len(inps_ref)
        for a, b in zip(inps, inps_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=1e-6, atol=1e-6)


def test_quant_capture_matches_per_unit(setup):
    model, params, qstate, xs, ts = setup
    names = tuple(u.name for u in model.units if u.layer_names)[:4]
    gc = GroupedCapture(model, batch_size=4)
    for name in names:
        inps_ref, _ = capture_unit_io(
            model, params, qstate, name, xs, ts, asym=True,
            act_quant=False, batch_size=4)
        inps = gc.quant_capture(params, qstate, name, xs, ts,
                                act_quant=False)
        for a, b in zip(inps, inps_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_plan_respects_byte_budget(setup):
    model, params, qstate, xs, ts = setup
    names = [u.name for u in model.units if u.layer_names]
    gc_small = GroupedCapture(model, batch_size=4, group_bytes=1 << 20)
    gc_big = GroupedCapture(model, batch_size=4, group_bytes=1 << 40)
    small = gc_small.plan(names, params, xs, ts)
    big = gc_big.plan(names, params, xs, ts)
    assert [n for g in small for n in g] == names  # order preserved
    assert len(big) < len(small)
    assert len(big) == 1  # everything fits one group


def test_calibrate_grouped_matches_ungrouped(setup):
    """End-to-end: grouped and per-unit calibration produce matching
    qstates (same captures -> same recon optimization inputs)."""
    model, params, _, xs, ts = setup
    base = dict(
        weight=ReconConfig(iters=6, batch_size=4),
        act=ReconConfig(iters=4, batch_size=4, lr=4e-4),
        quant_act=True, capture_batch=4, act_init_batch=8)
    q_grouped = calibrate(model, params, (xs, ts),
                          CalibConfig(grouped_capture=True, **base),
                          rng=jax.random.PRNGKey(1))
    q_per_unit = calibrate(model, params, (xs, ts),
                           CalibConfig(grouped_capture=False, **base),
                           rng=jax.random.PRNGKey(1))
    flat_g, tree_g = jax.tree_util.tree_flatten(q_grouped)
    flat_p, tree_p = jax.tree_util.tree_flatten(q_per_unit)
    assert tree_g == tree_p
    for a, b in zip(flat_g, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_unit_shapes_match_captures(setup):
    """unit_shapes (the AOT precompiler's shape source) must agree exactly
    with what fp_capture returns — a drift here would make every
    precompiled runner a silent cache miss."""
    model, params, _, xs, ts = setup
    names = tuple(u.name for u in model.units if u.layer_names)[:3]
    gc = GroupedCapture(model, batch_size=4)
    shapes = gc.unit_shapes(names, params, xs, ts)
    fp = gc.fp_capture(params, names, xs, ts)
    for n in names:
        (inps_s, out_s), (inps, out) = shapes[n], fp[n]
        assert tuple(a.shape for a in inps_s) == tuple(a.shape for a in inps)
        assert all(a.dtype == b.dtype for a, b in zip(inps_s, inps))
        assert out_s.shape == out.shape and out_s.dtype == out.dtype


def test_calibrate_precompile_matches(setup):
    """CalibConfig.precompile AOT-compiles the recon runners and capture
    sweeps ahead of the unit loop; it only warms executable caches, so the
    calibrated qstate must be bit-identical to the non-precompiled path."""
    model, params, _, xs, ts = setup
    base = dict(weight=ReconConfig(iters=6, batch_size=4),
                act=ReconConfig(iters=4, batch_size=4, lr=4e-4),
                quant_act=True, capture_batch=4, act_init_batch=8)
    q_pre = calibrate(model, params, (xs, ts),
                      CalibConfig(precompile=2, **base),
                      rng=jax.random.PRNGKey(1))
    q_off = calibrate(model, params, (xs, ts),
                      CalibConfig(precompile=0, **base),
                      rng=jax.random.PRNGKey(1))
    flat_a, tree_a = jax.tree_util.tree_flatten(q_pre)
    flat_b, tree_b = jax.tree_util.tree_flatten(q_off)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
