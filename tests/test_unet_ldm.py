"""LDM/SD UNet: shapes, unit wiring, and golden parity vs the reference
UNetModel across the three deployed architecture variants (LSUN-beds-style
AttentionBlock, LSUN-churches-style scale-shift+updown, SD-style spatial
transformer)."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig, LDMQuantPolicy
from qdiffusion_tpu.models.torch_import import state_dict_to_pytree
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode, INIT

REF = Path("/root/reference")

BEDS_TINY = LDMUNetConfig(
    image_size=16, in_channels=3, out_channels=3, model_channels=32,
    num_res_blocks=1, attention_resolutions=(4, 2), channel_mult=(1, 2),
    num_head_channels=16, use_spatial_transformer=False)

CHURCH_TINY = LDMUNetConfig(
    image_size=16, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, use_scale_shift_norm=True, resblock_updown=True)

SD_TINY = LDMUNetConfig(
    image_size=16, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24)


def _dezero(m, seed=1):
    """Replace zero_module-initialized tensors with small noise.

    The reference UNetModel zero-inits every residual-branch output conv,
    attention proj_out, and the final out conv (openaimodel.py zero_module)
    — a random-init model therefore outputs EXACTLY ZERO, which made
    output-level golden parity vacuous. De-zeroing makes every interior
    path contribute to the compared output."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = m.state_dict()
    for k, v in sd.items():
        if v.is_floating_point() and v.numel() and not v.abs().max():
            sd[k] = torch.empty_like(v).normal_(0, 0.05, generator=g)
    m.load_state_dict(sd)
    return m


def _ref_unet(cfg: LDMUNetConfig):
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    if "omegaconf" not in sys.modules:  # not installed; only ListConfig used
        import types

        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    import torch
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    m = UNetModel(
        image_size=cfg.image_size, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult), num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_spatial_transformer=cfg.use_spatial_transformer,
        transformer_depth=cfg.transformer_depth, context_dim=cfg.context_dim,
        num_classes=cfg.num_classes,
        legacy=cfg.legacy,
        dropout=0.0)
    m.eval()
    return _dezero(m)


@pytest.mark.parametrize("cfg,needs_ctx", [
    (BEDS_TINY, False), (CHURCH_TINY, False), (SD_TINY, True)])
def test_golden_parity(cfg, needs_ctx):
    import torch

    ref = _ref_unet(cfg)
    params = state_dict_to_pytree(ref.state_dict())
    model = LDMUNet(cfg)

    rng = np.random.default_rng(0)
    B = 2
    x_nchw = rng.normal(size=(B, cfg.in_channels, cfg.image_size,
                              cfg.image_size)).astype(np.float32)
    t_np = np.array([5.0, 700.0], dtype=np.float32)
    c_np = (rng.normal(size=(B, 7, cfg.context_dim)).astype(np.float32)
            if needs_ctx else None)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_nchw), torch.from_numpy(t_np),
                      context=torch.from_numpy(c_np) if needs_ctx else None
                      ).numpy()

    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = model.apply(params, x, jnp.asarray(t_np),
                       context=jnp.asarray(c_np) if needs_ctx else None)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref_out, rtol=2e-3, atol=5e-4)


def test_unit_registry_sd():
    model = LDMUNet(SD_TINY)
    names = [u.name for u in model.units]
    assert names[0] == "time_embed.0"
    assert "input_blocks.0.0" in names
    assert any("transformer_blocks" in n for n in names)
    assert any(".proj_in" in n for n in names)
    assert names[-1] == "out.2"
    # transformer unit declares its attn quant sites
    tu = next(u for u in model.units if "transformer_blocks" in u.name)
    assert len(tu.extra_sites) == 2 and tu.loss_axis == 1
    assert len(tu.layer_names) == 10


def test_act_quant_partition_attnblock():
    m1 = LDMUNet(BEDS_TINY, act_quant_partition=False)
    m2 = LDMUNet(BEDS_TINY, act_quant_partition=True)
    k1 = {u.kind for u in m1.units}
    k2 = {u.kind for u in m2.units}
    assert "attnblock" in k1 and "qkmatmul" not in k1
    assert "qkmatmul" in k2 and "smvmatmul" in k2 and "attnblock" not in k2
    # both partitions compute the same function
    params = m1.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 100.0)
    y1 = m1.apply(params, x, t)
    y2 = m2.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_quantized_forward_and_act_init():
    model = LDMUNet(SD_TINY, LDMQuantPolicy(), act_quant_partition=True)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.full((2,), 100.0)
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24))

    from qdiffusion_tpu.calib.engine import init_act_qstate, init_weight_qstate

    qstate = init_weight_qstate(model, params)
    qstate = init_act_qstate(model, params, qstate, x, t, c)
    ctx = QuantCtx(qstate, mode=QuantMode(w=True, a=True))
    y = model.apply(params, x, t, ctx, context=c)
    assert np.isfinite(np.asarray(y)).all()
    # attn sites got q/k/v/sm states
    tb_sites = [n for n in qstate if n.endswith(".attn1")]
    assert tb_sites and all(
        {"q", "k", "v", "sm"} <= set(qstate[s]) for s in tb_sites)


def test_split_shortcut_output_blocks():
    cfg = LDMUNetConfig(
        image_size=16, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_heads=1, split_shortcut=True)
    model = LDMUNet(cfg)
    lc = model.layer_cfg("output_blocks.0.0.skip_connection")
    assert lc.split == 64  # ch flowing up at the deepest level


ADM_TINY = LDMUNetConfig(
    image_size=16, in_channels=3, out_channels=3, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, num_classes=10)

HYBRID_TINY = LDMUNetConfig(
    image_size=16, in_channels=6, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24)


def test_adm_class_conditional_parity():
    """Class-conditional ('adm') forward: label_emb added to the time
    embedding (reference openaimodel.py:761-763 + DiffusionWrapper 'adm'
    branch, ddpm.py:1441-1443)."""
    import torch

    ref = _ref_unet(ADM_TINY)
    # de-zero the zero_module-initialized convs so the output is non-trivial
    # (otherwise the label-sensitivity check below is vacuous)
    with torch.no_grad():
        g = torch.Generator().manual_seed(11)
        for p in ref.parameters():
            if p.ndim >= 2 and not p.abs().sum():
                p.add_(0.02 * torch.randn(p.shape, generator=g))
    params = state_dict_to_pytree(ref.state_dict())
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t_np = np.array([100.0, 700.0], dtype=np.float32)
    labels = np.array([3, 7], dtype=np.int64)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x_nchw), torch.from_numpy(t_np),
                      y=torch.from_numpy(labels)).numpy()

    model = LDMUNet(ADM_TINY)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = model.apply(params, x, jnp.asarray(t_np),
                       y=jnp.asarray(labels, jnp.int32))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               out_ref, rtol=2e-4, atol=2e-5)

    # labels must actually condition the output
    ours2 = model.apply(params, x, jnp.asarray(t_np),
                        y=jnp.asarray([1, 2], jnp.int32))
    assert not np.allclose(np.asarray(ours), np.asarray(ours2))

    # pipeline dispatch ('adm': context = labels)
    from qdiffusion_tpu.pipelines import LatentDiffusionPipeline
    from qdiffusion_tpu.schedules import NoiseSchedule

    pipe = LatentDiffusionPipeline(
        unet=model, vae=None, schedule=NoiseSchedule.ldm("linear", 100, 0.00085, 0.012),
        conditioning_key="adm")
    fn = pipe.model_fn(params)
    out_pipe = fn(x, jnp.asarray(t_np), jnp.asarray(labels, jnp.int32))
    np.testing.assert_allclose(np.asarray(out_pipe), np.asarray(ours))


def test_hybrid_dispatch_parity():
    """'hybrid' = concat on channels + crossattn context, both at once
    (DiffusionWrapper, ddpm.py:1436-1440)."""
    import torch

    ref = _ref_unet(HYBRID_TINY)
    params = state_dict_to_pytree(ref.state_dict())
    rng = np.random.default_rng(1)
    z_nchw = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    cc_nchw = rng.normal(size=(2, 2, 16, 16)).astype(np.float32)
    ctx_np = rng.normal(size=(2, 7, 24)).astype(np.float32)
    t_np = np.array([50.0, 500.0], dtype=np.float32)
    with torch.no_grad():
        out_ref = ref(torch.cat([torch.from_numpy(z_nchw),
                                 torch.from_numpy(cc_nchw)], dim=1),
                      torch.from_numpy(t_np),
                      context=torch.from_numpy(ctx_np)).numpy()

    from qdiffusion_tpu.pipelines import LatentDiffusionPipeline
    from qdiffusion_tpu.schedules import NoiseSchedule

    model = LDMUNet(HYBRID_TINY)
    pipe = LatentDiffusionPipeline(
        unet=model, vae=None, schedule=NoiseSchedule.ldm("linear", 100, 0.00085, 0.012),
        conditioning_key="hybrid")
    fn = pipe.model_fn(params)
    out = fn(jnp.asarray(np.transpose(z_nchw, (0, 2, 3, 1))),
             jnp.asarray(t_np),
             {"c_concat": jnp.asarray(np.transpose(cc_nchw, (0, 2, 3, 1))),
              "c_crossattn": jnp.asarray(ctx_np)})
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               out_ref, rtol=2e-4, atol=2e-5)
