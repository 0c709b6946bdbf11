"""Integer inference path: bit-parity with fake-quant simulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.calib.engine import init_act_qstate, init_weight_qstate
from qdiffusion_tpu.deploy import fold_weights, make_quantized_step, pack_model
from qdiffusion_tpu.ops.int8 import int8_conv2d, int8_dense, pack_layer
from qdiffusion_tpu.ops.qlayers import LayerQuantConfig, qconv2d, qdense
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec, init_state
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode

WQ = AffineQuantizerSpec(n_bits=8, channel_wise=True, channel_axis=-1,
                         scale_method="max")
AQ = AffineQuantizerSpec(n_bits=8, symmetric=False, scale_method="max",
                         leaf_param=True)


def make_layer_state(w, x, cfg):
    st = {"w": init_state(w, cfg.wq)}
    if cfg.split:
        from qdiffusion_tpu.ops.qlayers import split_weight

        wa, wb = split_weight(w, cfg.split, cfg.in_axis)
        st = {"w": init_state(wa, cfg.wq), "w0": init_state(wb, cfg.wq),
              "a": init_state(x[..., : cfg.split], cfg.aq),
              "a0": init_state(x[..., cfg.split :], cfg.aq)}
    else:
        st["a"] = init_state(x, cfg.aq)
    return st


@pytest.mark.parametrize("padding,stride", [("SAME", 1), (1, 1), ("VALID", 1),
                                            ("VALID", 2)])
def test_int8_conv_matches_fake_quant(padding, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    cfg = LayerQuantConfig(wq=WQ, aq=AQ)
    lstate = make_layer_state(w, x, cfg)
    p = {"w": w, "b": b}

    ctx = QuantCtx({"L": lstate}, mode=QuantMode(w=True, a=True))
    ref = qconv2d(ctx, "L", p, x, cfg, stride=stride, padding=padding)

    packed = pack_layer(p, lstate, cfg)
    got = int8_conv2d(x, packed, stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_conv_symmetric_acts():
    rng = np.random.default_rng(1)
    aq_sym = AffineQuantizerSpec(n_bits=8, symmetric=True, scale_method="max",
                                 leaf_param=True)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.3)
    cfg = LayerQuantConfig(wq=WQ, aq=aq_sym)
    lstate = make_layer_state(w, x, cfg)
    p = {"w": w, "b": None}
    p = {"w": w}
    ctx = QuantCtx({"L": lstate}, mode=QuantMode(w=True, a=True))
    ref = qconv2d(ctx, "L", p, x, cfg, padding=1)
    got = int8_conv2d(x, pack_layer(p, lstate, cfg), padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_conv_split_matches():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 12)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, 12, 10)).astype(np.float32) * 0.5)
    cfg = LayerQuantConfig(wq=WQ, aq=AQ, split=8)
    lstate = make_layer_state(w, x, cfg)
    p = {"w": w}
    ctx = QuantCtx({"L": lstate}, mode=QuantMode(w=True, a=True))
    ref = qconv2d(ctx, "L", p, x, cfg, padding="VALID")
    got = int8_conv2d(x, pack_layer(p, lstate, cfg), padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_dense_matches():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    cfg = LayerQuantConfig(wq=WQ, aq=AQ, in_axis=0)
    lstate = make_layer_state(w, x, cfg)
    p = {"w": w, "b": b}
    ctx = QuantCtx({"L": lstate}, mode=QuantMode(w=True, a=True))
    ref = qdense(ctx, "L", p, x, cfg)
    got = int8_dense(x, pack_layer(p, lstate, cfg))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_w4_weights():
    rng = np.random.default_rng(4)
    wq4 = AffineQuantizerSpec(n_bits=4, channel_wise=True, channel_axis=-1,
                              scale_method="max")
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))
    cfg = LayerQuantConfig(wq=wq4, aq=AQ)
    lstate = make_layer_state(w, x, cfg)
    p = {"w": w}
    ctx = QuantCtx({"L": lstate}, mode=QuantMode(w=True, a=True))
    ref = qconv2d(ctx, "L", p, x, cfg, padding=1)
    got = int8_conv2d(x, pack_layer(p, lstate, cfg), padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_full_model_int8_engine_close_to_sim():
    model = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                    attn_resolutions=(8,), resolution=16))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 300.0)
    qstate = init_weight_qstate(model, params)
    qstate = init_act_qstate(model, params, qstate, x, t)

    ctx = QuantCtx(qstate, mode=QuantMode(w=True, a=True))
    sim = model.apply(params, x, t, ctx)

    # f32 carriers: only quantization-boundary flips separate the paths.
    # Per-layer parity is ~1e-6 (see kernel tests), but composed layers can
    # flip individual quantization levels when a value sits within float
    # noise of a rounding boundary — compare in norm, not elementwise.
    step32 = make_quantized_step(model, params, qstate, engine="int8",
                                 carrier_dtype=jnp.float32)
    got32 = step32(x, t)
    rel32 = float(jnp.linalg.norm(got32 - sim) / jnp.linalg.norm(sim))
    assert rel32 < 0.02

    # deployed bf16 carriers add bounded rounding drift
    step = make_quantized_step(model, params, qstate, engine="int8")
    got = step(x, t)
    rel = float(jnp.linalg.norm(got - sim) / jnp.linalg.norm(sim))
    assert rel < 0.06
    packed = pack_model(model, params, qstate)
    assert len(packed) > 20  # all convs/denses packed


def test_fold_engine_matches_weight_only_sim():
    model = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                    attn_resolutions=(8,), resolution=16))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 300.0)
    qstate = init_weight_qstate(model, params)

    ctx = QuantCtx(qstate, mode=QuantMode(w=True, a=False))
    sim = model.apply(params, x, t, ctx)
    folded = fold_weights(model, params, qstate)
    got = model.apply(folded, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(sim),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("eq,sa,sb", [
    ("bic,bjc->bij", (2, 10, 16), (2, 12, 16)),
    ("bij,bjc->bic", (2, 10, 12), (2, 12, 16)),
    ("bthc,bshc->bhts", (2, 10, 4, 8), (2, 12, 4, 8)),
    ("bhts,bshc->bthc", (2, 4, 10, 12), (2, 12, 4, 8)),
    ("bihd,bjhd->bhij", (2, 10, 4, 8), (2, 12, 4, 8)),
    ("bhij,bjhd->bihd", (2, 4, 10, 12), (2, 12, 4, 8)),
])
def test_int8_einsum_matches_fake_quant(eq, sa, sb):
    """Integer activation x activation einsum (attention matmuls) is
    bit-consistent with fake-quanting both operands then einsumming."""
    from qdiffusion_tpu.ops.int8 import int8_einsum
    from qdiffusion_tpu.quant.affine import fake_quant, init_state

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=sa).astype(np.float32))
    b = jnp.asarray(rng.normal(size=sb).astype(np.float32))
    spec = AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True)
    sm_spec = AffineQuantizerSpec(n_bits=8, always_zero=True,
                                  scale_method="max", leaf_param=True)
    a_spec = sm_spec if eq.startswith(("bij", "bhts", "bhij")) else spec
    if a_spec is sm_spec:
        a = jax.nn.softmax(a, axis=-1)  # post-softmax operand
    a_st = init_state(a, a_spec)
    b_st = init_state(b, spec)

    ref = jnp.einsum(eq, fake_quant(a, a_st["delta"], a_st["zero_point"],
                                    a_spec),
                     fake_quant(b, b_st["delta"], b_st["zero_point"], spec),
                     preferred_element_type=jnp.float32)
    got = int8_einsum(eq, a, b, a_st, b_st, a_spec, spec,
                      out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_engine_uses_integer_attention():
    """With the int8 engine, attention matmul sites run integer einsums
    (jaxpr contains int8-operand dot_generals beyond the convs)."""
    model = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                    attn_resolutions=(8,), resolution=16))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 300.0)
    qstate = init_weight_qstate(model, params)
    qstate = init_act_qstate(model, params, qstate, x, t)

    sim = model.apply(params, x, t,
                      QuantCtx(qstate, mode=QuantMode(w=True, a=True)))
    step = make_quantized_step(model, params, qstate, engine="int8",
                               carrier_dtype=jnp.float32)
    got = step(x, t)
    rel = float(jnp.linalg.norm(got - sim) / jnp.linalg.norm(sim))
    assert rel < 0.02
