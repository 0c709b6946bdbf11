"""Blockwise attention inside the LDM UNet matches the materializing path."""

import numpy as np
import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig

SD_TINY = LDMUNetConfig(
    image_size=16, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24)


def test_flash_model_parity_fp():
    m_mat = LDMUNet(SD_TINY, flash_threshold=0)
    m_flash = LDMUNet(SD_TINY, flash_threshold=16)  # 16x16=256 tokens >= 16
    params = m_mat.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.full((2,), 100.0)
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24))
    y1 = m_mat.apply(params, x, t, context=c)
    y2 = m_flash.apply(params, x, t, context=c)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)


def test_flash_model_parity_quantized():
    from qdiffusion_tpu.calib.engine import init_act_qstate, init_weight_qstate
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    m_mat = LDMUNet(SD_TINY, flash_threshold=0)
    m_flash = LDMUNet(SD_TINY, flash_threshold=16)
    params = m_mat.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.full((2,), 100.0)
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24))
    qstate = init_weight_qstate(m_mat, params)
    qstate = init_act_qstate(m_mat, params, qstate, x, t, c)
    mode = QuantMode(w=True, a=True)
    y1 = m_mat.apply(params, x, t, QuantCtx(qstate, mode=mode), context=c)
    y2 = m_flash.apply(params, x, t, QuantCtx(qstate, mode=mode), context=c)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=2e-5)
