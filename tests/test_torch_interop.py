"""Reference calibrated-checkpoint importer: round-trip parity.

Calibrate the reference's actual QuantModel in torch (AdaRound weight
quantizers via convert_adaround + first-forward act init), save its
state_dict exactly the way the reference scripts do
(sample_diffusion_ddim.py:223-234), import it with torch_interop, and
check the native quantized forward matches the torch QuantModel.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.models.torch_import import state_dict_to_pytree
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode
from qdiffusion_tpu.quant.torch_interop import (
    import_reference_qstate,
    split_reference_ckpt,
)

REF = Path("/root/reference")

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)


def _make_calibrated_ref(split: bool, weight_bit: int, act_bit: int,
                         quant_act: bool, seed: int = 0):
    """Build + 'calibrate' (scale-init + convert_adaround) the reference
    QuantModel, returning (qnn, fp_state_dict, saved_ckpt_state_dict)."""
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import torch
    import torch.nn as nn
    from ddim.models.diffusion import Model
    from qdiff import QuantModel
    from qdiff.adaptive_rounding import AdaRoundQuantizer
    from qdiff.quant_layer import UniformAffineQuantizer
    from qdiff.utils import convert_adaround

    ns = lambda **kw: types.SimpleNamespace(**kw)
    config = ns(
        model=ns(type="simple", in_channels=3, out_ch=3, ch=TINY.ch,
                 ch_mult=list(TINY.ch_mult),
                 num_res_blocks=TINY.num_res_blocks,
                 attn_resolutions=list(TINY.attn_resolutions), dropout=0.0,
                 resamp_with_conv=True),
        data=ns(image_size=TINY.resolution),
        diffusion=ns(num_diffusion_timesteps=1000),
        split_shortcut=split,
    )
    torch.manual_seed(seed)
    model = Model(config).eval()
    fp_sd = {k: v.clone() for k, v in model.state_dict().items()}
    wq_params = {"n_bits": weight_bit, "channel_wise": True,
                 "scale_method": "max"}
    aq_params = {"n_bits": act_bit, "symmetric": False, "channel_wise": False,
                 "scale_method": "max", "leaf_param": quant_act}
    qnn = QuantModel(model=model, weight_quant_params=wq_params,
                     act_quant_params=aq_params, sm_abit=8).eval()

    rng = np.random.default_rng(100 + seed)
    cali_x = torch.from_numpy(
        rng.normal(size=(2, 3, 16, 16)).astype(np.float32))
    cali_t = torch.from_numpy(np.array([100.0, 700.0], dtype=np.float32))

    # first-forward quantizer init, then AdaRound conversion — the state
    # resume_cali_model expects to find in the checkpoint
    qnn.set_quant_state(True, quant_act)
    with torch.no_grad():
        qnn(cali_x, cali_t)
    convert_adaround(qnn)
    # perturb some AdaRound alphas so the import actually carries learned
    # rounding decisions, not just the init
    g = torch.Generator().manual_seed(7)
    for m in qnn.model.modules():
        if isinstance(m, AdaRoundQuantizer):
            m.alpha.data += 0.5 * torch.randn(m.alpha.shape, generator=g)

    # save exactly like sample_diffusion_ddim.py:223-234
    for m in qnn.model.modules():
        if isinstance(m, AdaRoundQuantizer):
            m.zero_point = nn.Parameter(
                m.zero_point if torch.is_tensor(m.zero_point)
                else torch.tensor(float(m.zero_point)))
            m.delta = nn.Parameter(m.delta if torch.is_tensor(m.delta)
                                   else torch.tensor(float(m.delta)))
        elif isinstance(m, UniformAffineQuantizer) and quant_act:
            if m.zero_point is not None and not isinstance(
                    m.zero_point, nn.Parameter):
                m.zero_point = nn.Parameter(
                    m.zero_point if torch.is_tensor(m.zero_point)
                    else torch.tensor(float(m.zero_point)))
    ckpt_sd = {k: v.detach().clone() for k, v in qnn.state_dict().items()}
    return qnn, fp_sd, ckpt_sd


def _our_model(split: bool, weight_bit: int, act_bit: int, quant_act: bool):
    cfg = TINY if not split else DDIMUNetConfig(
        **{**TINY.__dict__, "split_shortcut": True})
    policy = QuantPolicy(
        wq=AffineQuantizerSpec(n_bits=weight_bit, channel_wise=True,
                               channel_axis=-1, scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=act_bit, scale_method="max",
                               leaf_param=quant_act))
    return DDIMUNet(cfg, policy)


@pytest.mark.parametrize("weight_bit,split", [(8, False), (4, True)])
def test_import_weight_only_forward_parity(weight_bit, split):
    """Imported AdaRound state reproduces the torch quantized forward
    bit-for-bit in fp32 tolerance (hard rounding is deterministic)."""
    import torch

    qnn, fp_sd, ckpt_sd = _make_calibrated_ref(split, weight_bit, 8,
                                               quant_act=False)
    rng = np.random.default_rng(3)
    x_nchw = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t_np = np.array([50.0, 900.0], dtype=np.float32)
    qnn.set_quant_state(True, False)
    with torch.no_grad():
        ref = qnn(torch.from_numpy(x_nchw), torch.from_numpy(t_np)).numpy()

    model = _our_model(split, weight_bit, 8, quant_act=False)
    np_sd = {k: v.numpy() for k, v in ckpt_sd.items()}
    fp, quant = split_reference_ckpt(np_sd)
    qstate = import_reference_qstate(quant, model)
    params = state_dict_to_pytree({k: v.numpy() for k, v in fp_sd.items()})

    # every registered weight site must have arrived
    for name, cfg in model.layer_cfgs.items():
        assert "w" in qstate.get(name, {}), name
        assert "alpha" in qstate[name]["w"], name
        if cfg.split:
            assert "w0" in qstate[name], name

    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = model.apply(params, x, jnp.asarray(t_np),
                       QuantCtx(qstate, mode=QuantMode(w=True, a=False,
                                                       soft=False)))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-3, atol=1e-3)


def test_import_with_act_quant():
    """W8A8 import: act quantizer scales arrive exactly; the full quantized
    forward agrees with torch to requantization-noise tolerance."""
    import torch

    qnn, fp_sd, ckpt_sd = _make_calibrated_ref(False, 8, 8, quant_act=True)
    rng = np.random.default_rng(4)
    x_nchw = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t_np = np.array([200.0, 600.0], dtype=np.float32)
    qnn.set_quant_state(True, True)
    with torch.no_grad():
        ref = qnn(torch.from_numpy(x_nchw), torch.from_numpy(t_np)).numpy()

    model = _our_model(False, 8, 8, quant_act=True)
    np_sd = {k: v.numpy() for k, v in ckpt_sd.items()}
    _, quant = split_reference_ckpt(np_sd)
    qstate = import_reference_qstate(quant, model)
    params = state_dict_to_pytree({k: v.numpy() for k, v in fp_sd.items()})

    # act deltas match the live torch quantizers exactly
    checked = 0
    for name, mod in qnn.model.named_modules():
        aq = getattr(mod, "act_quantizer", None)
        if aq is not None and getattr(aq, "delta", None) is not None:
            st = qstate.get(name, {}).get("a")
            assert st is not None, name
            np.testing.assert_allclose(float(np.asarray(st["delta"])),
                                       float(aq.delta.detach()), rtol=1e-6)
            checked += 1
    assert checked >= 15
    # attention operand quantizers (q/k/v/sm) came through
    attn_sites = [s for s, slots in qstate.items() if "q" in slots]
    assert attn_sites, "attention act quantizers missing"
    for s in attn_sites:
        assert {"q", "k", "v", "sm"} <= set(qstate[s])

    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = model.apply(params, x, jnp.asarray(t_np),
                       QuantCtx(qstate, mode=QuantMode(w=True, a=True,
                                                       soft=False)))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    rel = np.linalg.norm(ours_nchw - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"relative output deviation {rel:.4f}"


def test_cli_import_qstate(tmp_path, monkeypatch):
    """import-qstate: reference ckpt file -> qstate npz + FP params npz,
    then sample from both."""
    import torch

    from qdiffusion_tpu import cli
    from qdiffusion_tpu import config as qconfig
    from qdiffusion_tpu.config import SamplerConfig, ScheduleConfig, TaskConfig

    task = TaskConfig(
        name="tiny16", family="pixel",
        schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 100),
        sampler=SamplerConfig("generalized", 4, "uniform", 0.0),
        image_size=16, channels=3, unet_ddim=TINY)
    monkeypatch.setitem(qconfig.PRESETS, "tiny16", task)

    _, _, ckpt_sd = _make_calibrated_ref(False, 8, 8, quant_act=True)
    ckpt = tmp_path / "ref_cali.pth"
    torch.save(ckpt_sd, ckpt)

    qs_out = tmp_path / "qstate.npz"
    p_out = tmp_path / "params.npz"
    cli.main(["import-qstate", "--task", "tiny16", "--ckpt", str(ckpt),
              "--out", str(qs_out), "--params-out", str(p_out),
              "--weight-bit", "8", "--quant-act"])
    assert qs_out.exists() and p_out.exists()

    out = tmp_path / "samples"
    cli.main(["sample", "--task", "tiny16", "--ckpt", str(p_out),
              "--qstate", str(qs_out), "--weight-bit", "8", "--quant-act",
              "--n", "2", "--batch", "2", "--out", str(out)])
    assert len(list(out.glob("*.png"))) == 2


def test_import_strict_rejects_wrong_arch():
    """Importing a split checkpoint into a no-split model fails loudly
    (the w halves' deltas only cover w[:, :split]); unknown sites too."""
    _, _, ckpt_sd = _make_calibrated_ref(True, 4, 8, quant_act=False)
    model = _our_model(False, 4, 8, quant_act=False)  # split flag missing
    np_sd = {k: v.numpy() for k, v in ckpt_sd.items()}
    _, quant = split_reference_ckpt(np_sd)
    with pytest.raises(ValueError, match="split mismatch"):
        import_reference_qstate(quant, model)

    model_split = _our_model(True, 4, 8, quant_act=False)
    quant2 = dict(quant)
    quant2["model.bogus.layer.weight_quantizer.delta"] = np.ones(
        (4, 1, 1, 1), np.float32)
    with pytest.raises(KeyError, match="bogus"):
        import_reference_qstate(quant2, model_split)
