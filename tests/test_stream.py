"""Weight-streaming deployment engine: parity vs the fold engine.

'stream' keeps the calibrated integer weights as int8 in HBM and
dequantizes inside the matmul/conv weight load; mathematically it is the
fold engine with a bf16 per-channel affine instead of pre-folded bf16
weights, so outputs agree to bf16 resolution.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qdiffusion_tpu.calib.engine import init_weight_qstate
from qdiffusion_tpu.deploy import (
    fold_weights,
    make_quantized_step,
    stream_pack_model,
)
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
TINY_SPLIT = DDIMUNetConfig(**{**TINY.__dict__, "split_shortcut": True})


@pytest.mark.parametrize("cfg,wbits", [(TINY, 8), (TINY_SPLIT, 4)])
def test_stream_matches_fold(cfg, wbits):
    policy = QuantPolicy(wq=AffineQuantizerSpec(
        n_bits=wbits, channel_wise=True, channel_axis=-1, scale_method="max"))
    model = DDIMUNet(cfg, policy)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 300.0)

    fold_step = make_quantized_step(model, params, qstate, engine="fold")
    stream_step = make_quantized_step(model, params, qstate, engine="stream")
    y_fold = np.asarray(fold_step(x, t), np.float32)
    y_stream = np.asarray(stream_step(x, t), np.float32)
    rel = np.linalg.norm(y_stream - y_fold) / np.linalg.norm(y_fold)
    assert rel < 2e-2, rel  # bf16 affine vs f32 fold, same integer grid


def test_stream_pack_contents():
    model = DDIMUNet(TINY_SPLIT, QuantPolicy(wq=AffineQuantizerSpec(
        n_bits=4, channel_wise=True, channel_axis=-1, scale_method="max")))
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)
    packed = stream_pack_model(model, params, qstate, dense_only=False)
    assert set(packed) == set(qstate)
    split_sites = [n for n, c in model.layer_cfgs.items() if c.split]
    assert split_sites
    for n in split_sites:
        assert len(packed[n]["segs"]) == 2
    from qdiffusion_tpu.models.unet_ddim import _sub as _sub0

    for n, pk in packed.items():
        dense = _sub0(params, n)["w"].ndim == 2
        for seg in pk["segs"]:
            if dense:
                # 4-bit dense weights nibble-pack for the Pallas kernel
                assert seg["wp"].dtype == jnp.uint8
                from qdiffusion_tpu.ops.pallas.int4_matmul import \
                    unpack_int4_weight

                vals = np.asarray(unpack_int4_weight(seg["wp"]))
                assert vals.min() >= 0 and vals.max() <= 15
            else:
                assert seg["w_c"].dtype == jnp.int8
                # 4-bit grid recentred by 8: values in [-8, 7]
                vals = np.asarray(seg["w_c"])
                assert vals.min() >= -8 and vals.max() <= 7

    # default (deployed) pack streams only dense weights — convs fold
    dense = stream_pack_model(model, params, qstate)
    from qdiffusion_tpu.models.unet_ddim import _sub

    assert dense and all(
        _sub(params, n)["w"].ndim == 2 for n in dense)


def test_stream_cli(tmp_path, monkeypatch):
    from qdiffusion_tpu import cli
    from qdiffusion_tpu import config as qconfig
    from qdiffusion_tpu.config import SamplerConfig, ScheduleConfig, TaskConfig
    from qdiffusion_tpu.utils.checkpoints import save_qstate

    task = TaskConfig(
        name="tiny16s", family="pixel",
        schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 100),
        sampler=SamplerConfig("generalized", 4, "uniform", 0.0),
        image_size=16, channels=3, unet_ddim=TINY)
    monkeypatch.setitem(qconfig.PRESETS, "tiny16s", task)

    model = DDIMUNet(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)
    qs = tmp_path / "qstate.npz"
    save_qstate(qs, qstate)

    out = tmp_path / "imgs"
    cli.main(["sample", "--task", "tiny16s", "--qstate", str(qs),
              "--engine", "stream", "--n", "2", "--batch", "2",
              "--out", str(out)])
    assert len(list(out.glob("*.png"))) == 2
