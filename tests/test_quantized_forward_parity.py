"""The decisive parity test: our quantized forward vs the reference's
actual QuantModel on the same CIFAR UNet weights.

Covers the full wiring end to end: per-channel weight scale init, act
quantizer first-forward init ordering (each quantizer initializes from the
activations produced by the already-quantized prefix), attention q/k/v/sm
quantizer placement, and split-shortcut quantization.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.torch_import import state_dict_to_pytree
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import INIT, QuantCtx, QuantMode

REF = Path("/root/reference")

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)


def _ref_quant_model(split: bool, weight_bit: int, act_bit: int,
                     quant_act: bool):
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ddim.models.diffusion import Model
    from qdiff import QuantModel

    def ns(**kw):
        return types.SimpleNamespace(**kw)

    config = ns(
        model=ns(type="simple", in_channels=3, out_ch=3, ch=TINY.ch,
                 ch_mult=list(TINY.ch_mult), num_res_blocks=TINY.num_res_blocks,
                 attn_resolutions=list(TINY.attn_resolutions), dropout=0.0,
                 resamp_with_conv=True),
        data=ns(image_size=TINY.resolution),
        diffusion=ns(num_diffusion_timesteps=1000),
        split_shortcut=split,
    )
    torch.manual_seed(0)
    model = Model(config)
    model.eval()
    sd = {k: v.clone() for k, v in model.state_dict().items()}
    wq_params = {"n_bits": weight_bit, "channel_wise": True,
                 "scale_method": "max"}
    aq_params = {"n_bits": act_bit, "symmetric": False, "channel_wise": False,
                 "scale_method": "max", "leaf_param": quant_act}
    qnn = QuantModel(model=model, weight_quant_params=wq_params,
                     act_quant_params=aq_params, sm_abit=8)
    qnn.eval()
    return qnn, sd


@pytest.mark.parametrize("weight_bit,split", [(8, False), (4, True)])
def test_weight_quant_forward_parity(weight_bit, split):
    import torch

    qnn, sd = _ref_quant_model(split, weight_bit, 8, quant_act=False)
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t_np = np.array([100.0, 700.0], dtype=np.float32)

    qnn.set_quant_state(True, False)
    with torch.no_grad():
        ref = qnn(torch.from_numpy(x_nchw), torch.from_numpy(t_np)).numpy()

    cfg = TINY if not split else DDIMUNetConfig(
        **{**TINY.__dict__, "split_shortcut": True})
    policy = QuantPolicy(
        wq=AffineQuantizerSpec(n_bits=weight_bit, channel_wise=True,
                               channel_axis=-1, scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=False))
    model = DDIMUNet(cfg, policy)
    params = state_dict_to_pytree(sd)

    from qdiffusion_tpu.calib.engine import init_weight_qstate

    qstate = init_weight_qstate(model, params)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = model.apply(params, x, jnp.asarray(t_np),
                       QuantCtx(qstate, mode=QuantMode(w=True, a=False)))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-3, atol=1e-3)


def test_w8a8_first_forward_parity():
    """Act quantizers init sequentially during the first forward in both
    implementations. Exact per-element parity is impossible across
    frameworks (1e-6 conv noise flips round() at grid boundaries and every
    layer requantizes), so assert the two things that ARE deterministic:
    every initialized activation delta matches the reference quantizer's,
    and the forward outputs agree in norm."""
    import torch

    qnn, sd = _ref_quant_model(False, 8, 8, quant_act=True)
    rng = np.random.default_rng(1)
    x_nchw = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)
    t_np = np.linspace(0, 999, 4).astype(np.float32)

    qnn.set_quant_state(True, True)
    with torch.no_grad():
        ref = qnn(torch.from_numpy(x_nchw), torch.from_numpy(t_np)).numpy()

    policy = QuantPolicy(
        wq=AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                               scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True))
    model = DDIMUNet(TINY, policy)
    params = state_dict_to_pytree(sd)

    from qdiffusion_tpu.calib.engine import init_weight_qstate

    qstate = init_weight_qstate(model, params)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ctx = QuantCtx(qstate, mode=QuantMode(w=True, a=True), collect=INIT)
    ours = model.apply(params, x, jnp.asarray(t_np), ctx)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    rel = (np.linalg.norm(ours_nchw - ref) / np.linalg.norm(ref))
    assert rel < 0.05, f"relative output deviation {rel:.4f}"

    # strong check: per-layer act deltas equal the reference quantizers'
    ref_deltas = {}
    for name, mod in qnn.model.named_modules():
        aq = getattr(mod, "act_quantizer", None)
        if aq is not None and getattr(aq, "delta", None) is not None:
            ref_deltas[name] = float(aq.delta.detach())
    checked = 0
    for name, rd in ref_deltas.items():
        slot = ctx.collected.get(name, {}).get("a")
        if slot is None:
            continue
        mine = float(np.asarray(slot["delta"]))
        np.testing.assert_allclose(mine, rd, rtol=2e-2), name
        checked += 1
    assert checked >= 15  # all conv/linear act quantizers covered


def _ref_ldm_quant_model(cfg, split: bool, weight_bit: int,
                         quant_act: bool = False, act_bit: int = 8):
    """Reference ldm UNetModel wrapped in the reference QuantModel, the way
    txt2img.py:369-383 deploys it (split set on the module before wrap)."""
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    from test_unet_ldm import _ref_unet  # reuses omegaconf stub + seed 0

    import torch
    from qdiff import QuantModel

    m = _ref_unet(cfg)
    m.split = split  # reference txt2img.py:370-371
    sd = {k: v.clone() for k, v in m.state_dict().items()}
    wq_params = {"n_bits": weight_bit, "channel_wise": True,
                 "scale_method": "max"}
    aq_params = {"n_bits": act_bit, "symmetric": False, "channel_wise": False,
                 "scale_method": "max", "leaf_param": quant_act}
    qnn = QuantModel(model=m, weight_quant_params=wq_params,
                     act_quant_params=aq_params, sm_abit=8)
    qnn.eval()
    return qnn, sd


@pytest.mark.parametrize("variant,weight_bit,split", [
    ("sd", 8, False), ("beds", 4, True)])
def test_ldm_weight_quant_forward_parity(variant, weight_bit, split):
    """W-only quantized forward parity on the LDM/SD UNet vs the
    reference's QuantModel (QuantResBlock split plumbing + QuantModule
    wrapping of every conv/linear, qdiff/quant_model.py:25-61)."""
    import torch

    from qdiffusion_tpu.models.unet_ldm import (
        LDMQuantPolicy, LDMUNet, LDMUNetConfig)
    from test_unet_ldm import BEDS_TINY, SD_TINY

    base = SD_TINY if variant == "sd" else BEDS_TINY
    qnn, sd = _ref_ldm_quant_model(base, split, weight_bit)

    rng = np.random.default_rng(0)
    B = 2
    x_nchw = rng.normal(size=(B, base.in_channels, base.image_size,
                              base.image_size)).astype(np.float32)
    t_np = np.array([100.0, 700.0], dtype=np.float32)
    c_np = (rng.normal(size=(B, 7, base.context_dim)).astype(np.float32)
            if base.use_spatial_transformer else None)

    qnn.set_quant_state(True, False)
    with torch.no_grad():
        args = (torch.from_numpy(x_nchw), torch.from_numpy(t_np))
        ref = qnn(*args, torch.from_numpy(c_np)).numpy() \
            if c_np is not None else qnn(*args).numpy()

    cfg = LDMUNetConfig(**{**base.__dict__, "split_shortcut": split})
    policy = LDMQuantPolicy(
        wq=AffineQuantizerSpec(n_bits=weight_bit, channel_wise=True,
                               channel_axis=-1, scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max",
                               leaf_param=False))
    model = LDMUNet(cfg, policy)
    params = state_dict_to_pytree(sd)

    from qdiffusion_tpu.calib.engine import init_weight_qstate

    qstate = init_weight_qstate(model, params)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ctx = QuantCtx(qstate, mode=QuantMode(w=True, a=False))
    if c_np is not None:
        ours = model.apply(params, x, jnp.asarray(t_np), ctx,
                           context=jnp.asarray(c_np))
    else:
        ours = model.apply(params, x, jnp.asarray(t_np), ctx)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=2e-3, atol=2e-3)
