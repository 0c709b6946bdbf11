"""VAE decode/encode golden parity vs the reference Encoder/Decoder."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.torch_import import state_dict_to_pytree
from qdiffusion_tpu.models.vae import VAE, VAEConfig

REF = Path("/root/reference")

CFG = VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                attn_resolutions=(8,), in_channels=3, resolution=16,
                z_channels=4, double_z=True, embed_dim=4)


def _ref_modules():
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ldm.modules.diffusionmodules.model import Decoder, Encoder

    kw = dict(ch=CFG.ch, out_ch=CFG.out_ch, ch_mult=list(CFG.ch_mult),
              num_res_blocks=CFG.num_res_blocks,
              attn_resolutions=list(CFG.attn_resolutions), dropout=0.0,
              in_channels=CFG.in_channels, resolution=CFG.resolution,
              z_channels=CFG.z_channels, double_z=CFG.double_z)
    torch.manual_seed(0)
    dec = Decoder(**kw)
    enc = Encoder(**kw)
    dec.eval(), enc.eval()
    return enc, dec


def test_decoder_parity():
    import torch

    enc, dec = _ref_modules()
    # build the full param tree: decoder.* + post_quant_conv
    torch.manual_seed(1)
    pq = torch.nn.Conv2d(CFG.embed_dim, CFG.z_channels, 1)
    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    sd.update({f"post_quant_conv.{k}": v for k, v in pq.state_dict().items()})
    params = state_dict_to_pytree(sd)

    vae = VAE(CFG)
    rng = np.random.default_rng(0)
    z_nchw = rng.normal(size=(2, CFG.embed_dim, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = dec(pq(torch.from_numpy(z_nchw))).numpy()
    z = jnp.asarray(np.transpose(z_nchw, (0, 2, 3, 1)))
    ours = vae.decode(params, z, force_not_quantize=True)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-3, atol=5e-4)


def test_encoder_parity():
    import torch

    enc, dec = _ref_modules()
    torch.manual_seed(2)
    qc = torch.nn.Conv2d(2 * CFG.z_channels, 2 * CFG.embed_dim, 1)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"quant_conv.{k}": v for k, v in qc.state_dict().items()})
    params = state_dict_to_pytree(sd)

    vae = VAE(CFG)
    rng = np.random.default_rng(1)
    x_nchw = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = qc(enc(torch.from_numpy(x_nchw))).numpy()
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = vae.encode_moments(params, x)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-3, atol=5e-4)
    # mode == mean half
    mode = vae.encode_kl(params, x, sample=False)
    np.testing.assert_allclose(np.asarray(mode),
                               np.asarray(ours[..., : CFG.embed_dim]),
                               atol=1e-6)


def test_vq_lookup_snaps_to_codebook():
    vae = VAE(VAEConfig(n_embed=16, embed_dim=4, z_channels=4))
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (16, 4))
    params = {"quantize": {"embedding": {"weight": emb}}}
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    q = vae.vq_lookup(params, z)
    # every output vector is exactly one codebook row
    flat = np.asarray(q).reshape(-1, 4)
    emb_np = np.asarray(emb)
    for row in flat[:8]:
        assert np.min(np.linalg.norm(emb_np - row, axis=1)) < 1e-5
