"""Small conditioning encoders: class embedder, spatial rescaler."""

import numpy as np
import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.encoders import (
    class_embedder,
    identity_first_stage,
    spatial_rescaler,
)


def test_class_embedder_lookup():
    emb = jax.random.normal(jax.random.PRNGKey(0), (10, 8))
    params = {"embedding": {"weight": emb}}
    out = class_embedder(params, jnp.asarray([3, 7]))
    assert out.shape == (2, 1, 8)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(emb[3]))


def test_spatial_rescaler_downscale_and_remap():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    y = spatial_rescaler(x, n_stages=2, multiplier=0.5)
    assert y.shape == (2, 4, 4, 3)
    mapper = {"w": jax.random.normal(jax.random.PRNGKey(2), (1, 1, 3, 8))}
    y = spatial_rescaler(x, n_stages=1, multiplier=0.5, channel_mapper=mapper)
    assert y.shape == (2, 8, 8, 8)


def test_identity_first_stage():
    x = jnp.ones((2, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(identity_first_stage(x)),
                               np.asarray(x))


def test_resume_w_act_only_pass():
    """calibrate(skip_weight_pass=True) runs only the act pass (--resume_w)."""
    from qdiffusion_tpu.calib.engine import CalibConfig, calibrate, init_weight_qstate
    from qdiffusion_tpu.calib.recon import ReconConfig
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig

    model = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1,), num_res_blocks=1,
                                    attn_resolutions=(), resolution=8))
    params = model.init_params(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    ts = jnp.linspace(0, 99, 8)
    w_qstate = init_weight_qstate(model, params)

    cfg = CalibConfig(weight=ReconConfig(iters=4, batch_size=4),
                      act=ReconConfig(iters=4, batch_size=4),
                      quant_act=True, capture_batch=4, act_init_batch=8)
    qstate = calibrate(model, params, (xs, ts), cfg, qstate=w_qstate,
                       skip_weight_pass=True)
    # weight quantizers keep nearest rounding (no alpha added by the
    # skipped weight pass), act quantizers got initialized + trained
    assert "alpha" not in qstate["conv_in"]["w"]
    assert "a" in qstate["conv_in"]
