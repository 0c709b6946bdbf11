"""CLIP vision tower: golden parity vs HF transformers CLIPVisionModel."""

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    convert_hf_clip_vision,
)


def test_parity_with_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    hf_cfg = HFConfig(image_size=32, patch_size=8, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px))
        ref_pooled = out.pooler_output.numpy()
        ref_hidden = out.last_hidden_state.numpy()

    model = CLIPVisionEncoder(CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4))
    params = convert_hf_clip_vision(hf.state_dict())
    x = jnp.asarray(np.transpose(px, (0, 2, 3, 1)))
    pooled = model.apply(params, x, pooled=True)
    hidden = model.apply(params, x, pooled=False)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden,
                               rtol=1e-3, atol=1e-4)


def test_preprocess_contract():
    model = CLIPVisionEncoder(CLIPVisionConfig(image_size=16, patch_size=8))
    x = jnp.zeros((1, 8, 8, 3))  # [-1,1] domain, needs resize
    out = model.preprocess(x)
    assert out.shape == (1, 16, 16, 3)
    # x=0 -> pixel 0.5 -> (0.5 - mean)/std
    from qdiffusion_tpu.models.clip_vision import CLIP_MEAN, CLIP_STD

    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               (0.5 - CLIP_MEAN) / CLIP_STD, rtol=1e-5)
