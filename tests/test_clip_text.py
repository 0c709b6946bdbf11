"""CLIP text encoder: golden parity vs HF transformers CLIPTextModel
(random-initialized tiny config — no network needed)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.models.clip_text import (
    CLIPTextConfig,
    CLIPTextEncoder,
    convert_hf_clip_text,
)


def test_parity_with_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    ids = np.array([[1, 5, 9, 20, 3, 0, 0, 0],
                    [2, 7, 30, 4, 0, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    ours_model = CLIPTextEncoder(CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_positions=16))
    params = convert_hf_clip_text(hf.state_dict())
    ours = ours_model.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_causal_mask_effect():
    cfg = CLIPTextConfig(vocab_size=50, hidden_size=16, intermediate_size=32,
                         num_layers=1, num_heads=2, max_positions=8)
    model = CLIPTextEncoder(cfg)
    import jax

    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    D, I = cfg.hidden_size, cfg.intermediate_size
    lin = lambda i, a, b: {"w": jax.random.normal(keys[i], (a, b)) / np.sqrt(a),
                           "b": jnp.zeros((b,))}
    norm = lambda: {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    params = {
        "token_embedding": {"weight": jax.random.normal(keys[0], (50, D))},
        "position_embedding": {"weight": jax.random.normal(keys[1], (8, D))},
        "layers": {"0": {
            "self_attn": {"q_proj": lin(2, D, D), "k_proj": lin(3, D, D),
                          "v_proj": lin(4, D, D), "out_proj": lin(5, D, D)},
            "layer_norm1": norm(), "layer_norm2": norm(),
            "mlp": {"fc1": lin(6, D, I), "fc2": lin(7, I, D)},
        }},
        "final_layer_norm": norm(),
    }
    ids1 = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    ids2 = jnp.asarray([[1, 2, 3, 9]], jnp.int32)
    o1 = model.apply(params, ids1)
    o2 = model.apply(params, ids2)
    # causal: earlier positions unaffected by a later-token change
    np.testing.assert_allclose(np.asarray(o1[:, :3]), np.asarray(o2[:, :3]),
                               atol=1e-5)
    assert float(jnp.max(jnp.abs(o1[:, 3] - o2[:, 3]))) > 1e-4


def test_pooled_projection_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=16, hidden_act="quick_gelu",
                      projection_dim=24, eos_token_id=99)
    torch.manual_seed(1)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()
    # EOS == max token id (99) so argmax pooling matches HF's eos lookup
    ids = np.array([[1, 5, 9, 99, 0, 0], [2, 7, 30, 4, 99, 0]], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    model = CLIPTextEncoder(CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_positions=16))
    params = convert_hf_clip_text(hf.state_dict())
    got = model.pooled_apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)
