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
        w = _sub0(params, n)["w"]
        if w.ndim != 2:
            # conv packs carry the patch-matmul metadata and 2-D weights
            assert pk["kshape"].value == w.shape[:-2]
            assert sum(pk["in_chs"].value) == w.shape[-2]
        for seg in pk["segs"]:
            # 4-bit weights (dense AND conv) nibble-pack for the Pallas
            # streaming kernels
            assert seg["wp"].dtype == jnp.uint8
            from qdiffusion_tpu.ops.pallas.int4_matmul import \
                unpack_int4_weight

            vals = np.asarray(unpack_int4_weight(seg["wp"]))
            assert vals.min() >= 0 and vals.max() <= 15

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


@pytest.mark.parametrize("cfg,wbits", [(TINY, 8), (TINY_SPLIT, 4)])
def test_stream_convs_matches_fold(cfg, wbits):
    """stream_convs="all": conv weights resident in HBM, served by the
    Pallas patch-matmul kernels (qlayers._stream_conv2d) — full-model
    parity vs the fold engine (same integer grid, bf16 carrier). "all"
    forces the kernel path: under "auto" the byte cost model would fold
    every conv at this tiny scale (qlayers._stream_conv_profitable)."""
    policy = QuantPolicy(wq=AffineQuantizerSpec(
        n_bits=wbits, channel_wise=True, channel_axis=-1, scale_method="max"))
    model = DDIMUNet(cfg, policy)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    t = jnp.full((1,), 300.0)

    fold_step = make_quantized_step(model, params, qstate, engine="fold")
    conv_step = make_quantized_step(model, params, qstate, engine="stream",
                                    stream_convs="all")
    y_fold = np.asarray(fold_step(x, t), np.float32)
    y_conv = np.asarray(conv_step(x, t), np.float32)
    rel = np.linalg.norm(y_conv - y_fold) / np.linalg.norm(y_fold)
    assert rel < 2e-2, rel


def test_stream_conv_cost_model():
    """_stream_conv_profitable: folds CIFAR-scale convs (patch traffic +
    overhead swamp the small weight, measured 0.4x when forced), streams
    SD-deep-scale convs (1280ch at 8x8: 29.5 MB bf16 weight vs ~6 MB
    patches) and large 1x1 projections (no patch materialization)."""
    from qdiffusion_tpu.deploy import stream_pack_model
    from qdiffusion_tpu.models.base import LayerQuantConfig
    from qdiffusion_tpu.ops.qlayers import _stream_conv_profitable

    def pack_one(kh, kw, ci, co, n_bits=8):
        spec = AffineQuantizerSpec(n_bits=n_bits, channel_wise=True,
                                   channel_axis=-1, scale_method="max")

        class _M:
            layer_cfgs = {"c": LayerQuantConfig(wq=spec, aq=spec, in_axis=2)}

            @staticmethod
            def layer_cfg(name):
                return _M.layer_cfgs[name]

        w = jax.random.normal(jax.random.PRNGKey(0), (kh, kw, ci, co)) * 0.1
        params = {"c": {"w": w}}
        qstate = init_weight_qstate(_M, params)
        return stream_pack_model(_M, params, qstate, dense_only=False)["c"]

    # CIFAR conv: 3x3 128->128 at 32x32 b8 — patches 9x the weight: fold
    cifar = pack_one(3, 3, 128, 128)
    x32 = jnp.zeros((8, 32, 32, 128))
    assert not _stream_conv_profitable(cifar, x32, stride=1)
    # SD deep conv: 3x3 1280->1280 at 8x8 b2 — weight-bound: stream
    deep = pack_one(3, 3, 1280, 1280)
    x8 = jnp.zeros((2, 8, 8, 1280))
    assert _stream_conv_profitable(deep, x8, stride=1)
    # large 1x1 (skip projection 2560->1280): no patch cost at 16x16 b2
    proj = pack_one(1, 1, 2560, 1280)
    x16 = jnp.zeros((2, 16, 16, 2560))
    assert _stream_conv_profitable(proj, x16, stride=1)
    # same 1x1 weight but int4: still streams (saving grows)
    proj4 = pack_one(1, 1, 2560, 1280, n_bits=4)
    assert _stream_conv_profitable(proj4, x16, stride=1)
    # small 1x1 at high res: weight too small to cover overhead
    small = pack_one(1, 1, 320, 320)
    x64 = jnp.zeros((2, 64, 64, 320))
    assert not _stream_conv_profitable(small, x64, stride=1)


@pytest.mark.parametrize("wbits", [8, 4])
@pytest.mark.parametrize("khw,stride,split", [
    ((3, 3), 1, 0), ((3, 3), 2, 0), ((1, 1), 1, 0), ((3, 3), 1, 5)])
def test_stream_conv2d_unit(wbits, khw, stride, split):
    """_stream_conv2d vs the dequantized XLA conv: exact same integer
    weights, bf16 math — near-exact parity across filter sizes, strides,
    and split-shortcut segments."""
    from qdiffusion_tpu.nn import conv2d
    from qdiffusion_tpu.ops.qlayers import _stream_conv2d, split_weight
    from qdiffusion_tpu.quant.affine import fake_quant, init_state

    kh, kw = khw
    ci, co = 13, 24
    rng = np.random.default_rng(wbits + kh + stride + split)
    w = jnp.asarray(rng.normal(size=(kh, kw, ci, co)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 9, 9, ci)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    spec = AffineQuantizerSpec(n_bits=wbits, channel_wise=True,
                               channel_axis=-1, scale_method="max")

    class OneConv:
        def __init__(self):
            from qdiffusion_tpu.models.base import LayerQuantConfig

            self._cfg = LayerQuantConfig(wq=spec, aq=spec, split=split,
                                         in_axis=2)

        @property
        def layer_cfgs(self):
            return {"c": self._cfg}

    from qdiffusion_tpu.deploy import stream_pack_model

    params = {"c": {"w": w, "b": b}}
    if split:
        wa, wb = split_weight(w, split, 2)
        qstate = {"c": {"w": init_state(wa, spec),
                        "w0": init_state(wb, spec)}}
        wq = jnp.concatenate([
            fake_quant(wa, qstate["c"]["w"]["delta"],
                       qstate["c"]["w"]["zero_point"], spec),
            fake_quant(wb, qstate["c"]["w0"]["delta"],
                       qstate["c"]["w0"]["zero_point"], spec)], axis=2)
    else:
        qstate = {"c": {"w": init_state(w, spec)}}
        wq = fake_quant(w, qstate["c"]["w"]["delta"],
                        qstate["c"]["w"]["zero_point"], spec)

    expected = np.asarray(conv2d(x, wq, b, stride=stride, padding="SAME"))
    packed = stream_pack_model(OneConv(), params, qstate, dense_only=False)
    got = np.asarray(_stream_conv2d(packed["c"], x, stride=stride,
                                    padding="SAME"))
    rel = np.linalg.norm(got - expected) / np.linalg.norm(expected)
    assert rel < 1e-2, rel


def test_stream_conv1d_k1_unit():
    """k=1 conv1d streams as a dense over channels."""
    from qdiffusion_tpu.models.base import LayerQuantConfig
    from qdiffusion_tpu.nn import conv1d
    from qdiffusion_tpu.deploy import stream_pack_model
    from qdiffusion_tpu.ops.qlayers import qconv1d
    from qdiffusion_tpu.quant.affine import fake_quant, init_state
    from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

    rng = np.random.default_rng(0)
    ci, co = 32, 48
    w = jnp.asarray(rng.normal(size=(1, ci, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 10, ci)).astype(np.float32))
    spec = AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                               scale_method="max")

    class OneConv:
        layer_cfgs = {"c": LayerQuantConfig(wq=spec, aq=spec, in_axis=1)}

    qstate = {"c": {"w": init_state(w, spec)}}
    packed = stream_pack_model(OneConv(), {"c": {"w": w, "b": b}}, qstate,
                               dense_only=False)
    wq = fake_quant(w, qstate["c"]["w"]["delta"],
                    qstate["c"]["w"]["zero_point"], spec)
    expected = np.asarray(conv1d(x, wq, b))
    ctx = QuantCtx(None, mode=QuantMode(w=False, a=False), engine="stream",
                   packed=packed)
    got = np.asarray(qconv1d(ctx, "c", {"w": w, "b": b}, x,
                             OneConv.layer_cfgs["c"]))
    rel = np.linalg.norm(got - expected) / np.linalg.norm(expected)
    assert rel < 1e-2, rel
