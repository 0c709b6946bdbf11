"""bf16 evaluation carrier in the samplers (deployment dtype).

The samplers' f32 step tables promote the scan carry to f32, so without
an explicit carrier every model call after step 1 runs f32 activations —
against bf16 params that upcasts the whole UNet to half MXU rate on TPU.
eval_dtype casts only the model input (and eps back up); scheduler math
stays f32, so results track the f32 flow to bf16 resolution.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
from qdiffusion_tpu.samplers.ddim import ddim_sample
from qdiffusion_tpu.samplers.ldm import DDIMTables, ddim_sample_ldm, \
    plms_sample

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)


def _betas(n=100):
    return np.linspace(1e-4, 2e-2, n, dtype=np.float64)


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


def test_ddim_eval_dtype_casts_model_input():
    model = DDIMUNet(TINY)
    params = _bf16(model.init_params(jax.random.PRNGKey(0)))
    seen = []

    def fn(x, t):
        seen.append(x.dtype)
        return model.apply(params, x, t)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    y, _ = ddim_sample(fn, x, [0, 30, 60, 90], _betas(),
                       eval_dtype=jnp.bfloat16)
    assert all(d == jnp.bfloat16 for d in seen)
    assert y.dtype == jnp.float32  # scan carry stays f32


@pytest.mark.parametrize("sampler", ["ddim", "plms"])
def test_ldm_eval_dtype_matches_f32(sampler):
    """bf16-carrier result tracks the all-f32 flow to bf16 resolution."""
    model = DDIMUNet(TINY)
    params = model.init_params(jax.random.PRNGKey(0))

    def fn32(x, t, c=None):
        return model.apply(params, x, t)

    pbf = _bf16(params)

    def fnbf(x, t, c=None):
        assert x.dtype == jnp.bfloat16
        return model.apply(pbf, x, t)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    tables = DDIMTables.build(
        np.cumprod(1.0 - _betas()), 5, 0.0)
    run = ddim_sample_ldm if sampler == "ddim" else plms_sample
    kw = {} if sampler == "plms" else {"eta_noise": False}
    y32, _ = run(fn32, x, tables, **kw)
    ybf, _ = run(fnbf, x, tables, eval_dtype=jnp.bfloat16, **kw)
    assert ybf.dtype == jnp.float32
    rel = (np.linalg.norm(np.asarray(ybf) - np.asarray(y32))
           / np.linalg.norm(np.asarray(y32)))
    assert rel < 5e-2, rel


def test_generate_fn_infers_bf16_carrier():
    """make_generate_fn picks the bf16 carrier for all-bf16 param trees
    (the headline/serving deployment) and leaves f32 trees on the
    reference-parity single-dtype flow."""
    from qdiffusion_tpu.config import PRESETS, SamplerConfig, ScheduleConfig, \
        TaskConfig
    from qdiffusion_tpu.pipelines import PixelDiffusionPipeline
    from qdiffusion_tpu.schedules import NoiseSchedule
    from qdiffusion_tpu.serving import make_generate_fn

    task = TaskConfig(
        name="tiny16e", family="pixel",
        schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 100),
        sampler=SamplerConfig("generalized", 3, "uniform", 0.0),
        image_size=16, channels=3, unet_ddim=TINY)
    model = DDIMUNet(TINY)
    seen = []
    orig_apply = model.apply

    def spy_apply(p, x, t, *a, **k):
        seen.append(x.dtype)
        return orig_apply(p, x, t, *a, **k)

    model.apply = spy_apply
    pipe = PixelDiffusionPipeline(
        model, NoiseSchedule.ddpm("linear", 1e-4, 2e-2, 100))
    params = _bf16(model.init_params(jax.random.PRNGKey(0)))
    gen = make_generate_fn(task, params, pipe=pipe, model=model)
    imgs = gen(np.arange(2, dtype=np.int64))
    assert np.asarray(imgs).shape == (2, 16, 16, 3)
    assert seen and all(d == jnp.bfloat16 for d in seen)
