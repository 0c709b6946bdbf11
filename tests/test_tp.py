"""Tensor parallelism (parallel/tp.py): megatron-style sharding specs for
the LDM/SD UNet over a ("data", "model") mesh, validated on the 8-device
virtual CPU mesh — fp and quantized forwards must match the replicated
single-program result, and the specs must actually shard the weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qdiffusion_tpu.calib.engine import init_act_qstate, init_weight_qstate
from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig
from qdiffusion_tpu.parallel.tp import (
    count_sharded, make_tp_mesh, shard_params_tp, tp_param_specs,
    tp_sharding_tree)
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

SD_TINY = LDMUNetConfig(
    image_size=16, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24)

BEDS_TINY = LDMUNetConfig(
    image_size=16, in_channels=3, out_channels=3, model_channels=32,
    num_res_blocks=1, attention_resolutions=(4, 2), channel_mult=(1, 2),
    num_head_channels=16, use_spatial_transformer=False)


def _inputs(cfg, batch=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (batch, cfg.image_size, cfg.image_size,
                                  cfg.in_channels))
    t = jnp.linspace(10.0, 900.0, batch)
    ctxt = None
    if cfg.context_dim:
        ctxt = jax.random.normal(ks[1], (batch, 7, cfg.context_dim))
    return x, t, ctxt


def test_specs_shard_transformer_and_ff():
    m = LDMUNet(SD_TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    specs = tp_param_specs(m, params, 4)
    assert count_sharded(specs) >= 8  # q/k/v/out + ff pairs per block
    flat = {".".join(str(k.key) for k in p): s
            for p, s in jax.tree_util.tree_leaves_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))}
    tb = "middle_block.1.transformer_blocks.0"
    assert flat[f"{tb}.attn1.to_q.w"] == P(None, "model")
    assert flat[f"{tb}.attn1.to_out.0.w"] == P("model", None)
    assert flat[f"{tb}.ff.net.0.proj.w"] == P(None, "model")
    assert flat[f"{tb}.ff.net.2.w"] == P("model", None)
    # biases after row-parallel layers stay replicated
    assert flat[f"{tb}.attn1.to_out.0.b"] == P()
    # convs replicated
    assert flat["middle_block.0.in_layers.2.w"] == P()


def test_specs_gate_on_head_divisibility():
    m = LDMUNet(SD_TINY)  # 4 heads
    params = m.init_params(jax.random.PRNGKey(0))
    assert count_sharded(tp_param_specs(m, params, 8)) == 0


def test_tp_forward_matches_replicated_sd():
    m = LDMUNet(SD_TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x, t, ctxt = _inputs(SD_TINY, batch=4)
    ref = jax.jit(lambda p, x, t, c: m.apply(p, x, t, context=c))(
        params, x, t, ctxt)

    mesh = make_tp_mesh(2, 4)
    specs = tp_param_specs(m, params, 4)
    assert count_sharded(specs) > 0
    p_sh = tp_sharding_tree(mesh, specs)
    data = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda p, x, t, c: m.apply(p, x, t, context=c),
                 in_shardings=(p_sh, data, data, data),
                 out_shardings=data)
    out = fn(shard_params_tp(params, mesh, specs),
             jax.device_put(x, data), jax.device_put(t, data),
             jax.device_put(ctxt, data))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_tp_params_actually_distributed():
    m = LDMUNet(SD_TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    mesh = make_tp_mesh(2, 4)
    specs = tp_param_specs(m, params, 4)
    sharded = shard_params_tp(params, mesh, specs)
    w = sharded["middle_block"]["1"]["transformer_blocks"]["0"]["ff"][
        "net"]["0"]["proj"]["w"]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(w.shape[0], w.shape[1] // 4)}


def test_tp_forward_matches_replicated_attnblock():
    m = LDMUNet(BEDS_TINY)  # heads: 2 at ch=32, 4 at ch=64
    params = m.init_params(jax.random.PRNGKey(1))
    x, t, _ = _inputs(BEDS_TINY, batch=4, seed=2)
    ref = jax.jit(lambda p, x, t: m.apply(p, x, t))(params, x, t)

    mesh = make_tp_mesh(4, 2)
    specs = tp_param_specs(m, params, 2)
    assert count_sharded(specs) > 0
    p_sh = tp_sharding_tree(mesh, specs)
    data = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda p, x, t: m.apply(p, x, t),
                 in_shardings=(p_sh, data, data), out_shardings=data)
    out = fn(shard_params_tp(params, mesh, specs),
             jax.device_put(x, data), jax.device_put(t, data))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_tp_generate_matches_single_device():
    """make_generate_fn(mesh=data x model) tensor-parallel-shards the UNet
    params through the production jitted sample+decode program; outputs
    must match the single-device program (SD-style CFG task)."""
    from test_pipelines import _vae_params

    from qdiffusion_tpu.config import (SamplerConfig, ScheduleConfig,
                                       TaskConfig)
    from qdiffusion_tpu.models.vae import VAE, VAEConfig
    from qdiffusion_tpu.pipelines import LatentDiffusionPipeline
    from qdiffusion_tpu.schedules import NoiseSchedule
    from qdiffusion_tpu.serving import make_generate_fn

    vae_cfg = VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), in_channels=3, resolution=32,
                        z_channels=4, double_z=True, embed_dim=4)
    task = TaskConfig(
        name="tiny-tp-sd", family="sd",
        schedule=ScheduleConfig("ldm", "linear", 0.00085, 0.012, 100),
        sampler=SamplerConfig("plms", 2, "uniform", 0.0, guidance_scale=3.0),
        image_size=32, channels=3, latent_size=16, latent_channels=4,
        scale_factor=0.18, conditioning_key="crossattn",
        unet_ldm=SD_TINY, vae=vae_cfg)
    m = LDMUNet(SD_TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    vae = VAE(vae_cfg)
    vae_params = _vae_params(vae, jax.random.PRNGKey(1))
    sched = NoiseSchedule.ldm("linear", 100, 0.00085, 0.012)
    pipe = LatentDiffusionPipeline(unet=m, vae=vae, schedule=sched,
                                   scale_factor=0.18,
                                   conditioning_key="crossattn")
    seeds = np.arange(4, dtype=np.int64)
    cond = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                        (4, 7, SD_TINY.context_dim)))
    uncond = np.zeros((7, SD_TINY.context_dim), np.float32)

    single = np.asarray(make_generate_fn(
        task, params, vae_params, pipe=pipe, model=m,
        uncond=uncond)(seeds, cond))

    mesh = make_tp_mesh(2, 4)
    gen = make_generate_fn(task, params, vae_params, pipe=pipe, model=m,
                           uncond=uncond, mesh=mesh)
    out = gen(seeds, cond)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), single, rtol=2e-5, atol=2e-5)


def test_tp_quantized_forward_matches_replicated():
    m = LDMUNet(SD_TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x, t, ctxt = _inputs(SD_TINY, batch=4)
    qstate = init_weight_qstate(m, params)
    qstate = init_act_qstate(m, params, qstate, x, t, ctxt)
    mode = QuantMode(w=True, a=True, soft=False)

    def f(p, q, x, t, c):
        return m.apply(p, x, t, QuantCtx(q, mode=mode), context=c)

    ref = jax.jit(f)(params, qstate, x, t, ctxt)

    mesh = make_tp_mesh(2, 4)
    specs = tp_param_specs(m, params, 4)
    p_sh = tp_sharding_tree(mesh, specs)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(f, in_shardings=(p_sh, repl, data, data, data),
                 out_shardings=data)
    q_repl = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), qstate)
    out = fn(shard_params_tp(params, mesh, specs), q_repl,
             jax.device_put(x, data), jax.device_put(t, data),
             jax.device_put(ctxt, data))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
