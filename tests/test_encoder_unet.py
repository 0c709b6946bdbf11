"""EncoderUNetModel golden parity vs the reference half-UNet."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.models.encoder_unet import EncoderUNet, EncoderUNetConfig
from qdiffusion_tpu.models.torch_import import state_dict_to_pytree

REF = Path("/root/reference")


@pytest.mark.parametrize("pool", ["adaptive", "spatial"])
def test_parity(pool):
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ldm.modules.diffusionmodules.openaimodel import EncoderUNetModel

    torch.manual_seed(0)
    ref = EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=(1, 2),
        num_heads=4, pool=pool, dropout=0.0).eval()
    from test_unet_ldm import _dezero

    _dezero(ref)  # zero_module-init'd branches made the compare vacuous

    cfg = EncoderUNetConfig(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, pool=pool)
    model = EncoderUNet(cfg)
    params = state_dict_to_pytree(ref.state_dict())

    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t_np = np.array([10.0, 500.0], dtype=np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x_nchw), torch.from_numpy(t_np)).numpy()
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    got = model.apply(params, x, jnp.asarray(t_np))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                               atol=5e-4)


def test_init_and_units():
    cfg = EncoderUNetConfig(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_heads=4, pool="adaptive")
    model = EncoderUNet(cfg)
    names = [u.name for u in model.units]
    assert not any(n.startswith("output_blocks") for n in names)
    assert "middle_block.0" in names
    import jax

    params = model.init_params(jax.random.PRNGKey(0))
    out = model.apply(params, jnp.zeros((2, 16, 16, 3)),
                      jnp.full((2,), 5.0))
    assert out.shape == (2, 10)
