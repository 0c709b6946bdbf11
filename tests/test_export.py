"""Quantized checkpoint export/import: round-trip equals the fold engine,
and W4 checkpoints realize the compression claim."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from qdiffusion_tpu.calib.engine import init_weight_qstate
from qdiffusion_tpu.deploy import (
    export_quantized_checkpoint,
    fold_weights,
    load_quantized_checkpoint,
)
from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig, QuantPolicy
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

TINY = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), resolution=8, split_shortcut=True)

W4 = QuantPolicy(
    wq=AffineQuantizerSpec(n_bits=4, channel_wise=True, channel_axis=-1,
                           scale_method="max"),
    aq=AffineQuantizerSpec(n_bits=8, scale_method="max", leaf_param=True))


def test_export_roundtrip_matches_fold(tmp_path):
    model = DDIMUNet(TINY, W4)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)

    manifest = export_quantized_checkpoint(model, params, qstate,
                                           tmp_path / "w4.npz")
    assert manifest["conv_in"]["bits"] == 4
    assert any(v["split"] for v in manifest.values())  # split layers present

    restored, _ = load_quantized_checkpoint(tmp_path / "w4.npz")
    folded = fold_weights(model, params, qstate)

    # dequantized weights equal the fold-engine weights (fp16 bias rounding
    # aside) -> same model output
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    t = jnp.full((2,), 100.0)
    y_fold = model.apply(folded, x, t)
    restored_j = jax.tree_util.tree_map(jnp.asarray, restored)
    y_restored = model.apply(restored_j, x, t)
    np.testing.assert_allclose(np.asarray(y_restored), np.asarray(y_fold),
                               rtol=2e-3, atol=2e-3)


def test_w4_checkpoint_is_small(tmp_path):
    model = DDIMUNet(TINY, W4)
    params = model.init_params(jax.random.PRNGKey(0))
    qstate = init_weight_qstate(model, params)
    export_quantized_checkpoint(model, params, qstate, tmp_path / "w4.npz")

    n_params = sum(np.asarray(x).size
                   for x in jax.tree_util.tree_leaves(params))
    fp32_bytes = n_params * 4
    ckpt_bytes = Path(tmp_path / "w4.npz").stat().st_size
    # 4-bit weights + fp16 scalars + npz compression: far below fp32
    assert ckpt_bytes < fp32_bytes / 4
