"""SD text-to-image CLI flow: prompt -> BPE tokenizer -> CLIP tower -> CFG
PLMS sampling -> VAE decode, and conditional calibration-data generation.

Covers the reference txt2img path end to end
(scripts/txt2img.py:236-241, :538-541) on a tiny model zoo.
"""

import numpy as np
import pytest

import jax

from qdiffusion_tpu import cli
from qdiffusion_tpu import config as qconfig
from qdiffusion_tpu.config import SamplerConfig, ScheduleConfig, TaskConfig
from qdiffusion_tpu.models.clip_text import CLIPTextConfig, convert_hf_clip_text
from qdiffusion_tpu.models.clip_tokenizer import CLIPTokenizer, write_tiny_vocab
from qdiffusion_tpu.models.unet_ldm import LDMUNet, LDMUNetConfig
from qdiffusion_tpu.models.vae import VAE, VAEConfig
from qdiffusion_tpu.utils.checkpoints import save_nested, save_pytree

WORDS = ["a", "photo", "of", "cat", "riding", "horse"]
PROMPT = "a photo of a cat riding a horse"

HIDDEN = 32


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    d = tmp_path_factory.mktemp("sd_assets")
    vf, mf = write_tiny_vocab(d, WORDS)
    tok = CLIPTokenizer(vf, mf)
    V = len(tok.encoder)

    hf_cfg = HFConfig(vocab_size=V, hidden_size=HIDDEN, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    clip_pt = d / "clip.pt"
    torch.save(hf.state_dict(), clip_pt)
    clip_npz = d / "clip.npz"
    save_nested(clip_npz, convert_hf_clip_text(hf.state_dict()))

    vae_cfg = VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), in_channels=3, resolution=16,
                        z_channels=4, double_z=True, embed_dim=4)
    vae = VAE(vae_cfg)
    vae_npz = d / "vae.npz"
    save_nested(vae_npz, vae.init_params(jax.random.PRNGKey(0)))

    unet_cfg = LDMUNetConfig(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=HIDDEN)
    unet = LDMUNet(unet_cfg)
    params = unet.init_params(jax.random.PRNGKey(1))
    # the faithful init zeroes proj_out (reference zero_module), which makes
    # cross-attention (and CFG) a no-op on fresh weights; de-zero so the
    # tests can observe conditioning
    import jax.numpy as jnp

    def dezero(path, leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 2 and not jnp.any(leaf):
            k = jax.random.PRNGKey(hash(path) % (2**31))
            return 0.05 * jax.random.normal(k, leaf.shape)
        return leaf

    params = jax.tree_util.tree_map_with_path(
        lambda p, l: dezero(str(p), l), params)
    unet_npz = d / "unet.npz"
    save_pytree(unet_npz, params)

    task = TaskConfig(
        name="sd-tiny", family="sd",
        schedule=ScheduleConfig("ldm", "linear", 0.00085, 0.012, 100),
        sampler=SamplerConfig("plms", 6, "uniform", 0.0, guidance_scale=7.5),
        image_size=16, channels=3, latent_size=8, latent_channels=4,
        scale_factor=0.18, conditioning_key="crossattn",
        unet_ldm=unet_cfg,
        vae=vae_cfg,
        clip=CLIPTextConfig(vocab_size=V, hidden_size=HIDDEN,
                            intermediate_size=64, num_layers=2, num_heads=4,
                            max_positions=77))
    return {"dir": d, "clip_pt": clip_pt, "clip_npz": clip_npz,
            "vae_npz": vae_npz, "unet_npz": unet_npz, "task": task}


@pytest.fixture(autouse=True)
def sd_tiny_preset(monkeypatch, assets):
    monkeypatch.setitem(qconfig.PRESETS, "sd-tiny", assets["task"])


def test_make_cali_data_with_prompt(tmp_path, assets):
    """make-cali-data emits the conditional (xs, ts, cs, ucs) trajectory the
    reference collects for SD calibration (qdiff/utils.py:325-348)."""
    traj_path = tmp_path / "traj.npz"
    cli.main(["make-cali-data", "--task", "sd-tiny", "--n", "2",
              "--prompt", PROMPT,
              "--tokenizer-dir", str(assets["dir"]),
              "--clip-ckpt", str(assets["clip_pt"]),
              "--out", str(traj_path)])
    d = np.load(traj_path)
    assert set(d.files) >= {"xs", "ts", "cs", "ucs"}
    S = d["xs"].shape[0]
    assert d["cs"].shape == (S, 2, 77, HIDDEN)
    assert d["ucs"].shape == (S, 2, 77, HIDDEN)
    # cond differs from uncond (the empty-prompt row)
    assert not np.allclose(d["cs"], d["ucs"])


def test_sample_from_prompt(tmp_path, assets):
    """Full txt2img: prompt -> ids -> CLIP context -> PLMS CFG -> decode."""
    out = tmp_path / "imgs"
    cli.main(["sample", "--task", "sd-tiny", "--n", "2", "--batch", "2",
              "--prompt", PROMPT, "--scale", "7.5",
              "--tokenizer-dir", str(assets["dir"]),
              "--clip-ckpt", str(assets["clip_npz"]),
              "--vae-ckpt", str(assets["vae_npz"]),
              "--out", str(out)])
    assert len(list(out.glob("*.png"))) == 2


def test_sample_from_token_ids(tmp_path, assets):
    """--token-ids bypasses the tokenizer (precomputed CLIP ids)."""
    tok = CLIPTokenizer(assets["dir"] / "vocab.json",
                        assets["dir"] / "merges.txt")
    ids_path = tmp_path / "ids.npz"
    np.savez(ids_path, cond=tok([PROMPT]), uncond=tok([""]))
    out = tmp_path / "imgs"
    cli.main(["sample", "--task", "sd-tiny", "--n", "2", "--batch", "2",
              "--token-ids", str(ids_path),
              "--clip-ckpt", str(assets["clip_npz"]),
              "--vae-ckpt", str(assets["vae_npz"]),
              "--out", str(out)])
    assert len(list(out.glob("*.png"))) == 2


def test_prompt_without_tokenizer_dir_errors(assets, tmp_path):
    with pytest.raises(SystemExit, match="tokenizer-dir"):
        cli.main(["sample", "--task", "sd-tiny", "--n", "1", "--batch", "1",
                  "--prompt", PROMPT,
                  "--clip-ckpt", str(assets["clip_npz"]),
                  "--vae-ckpt", str(assets["vae_npz"]),
                  "--out", str(tmp_path / "x")])


def test_cfg_scale_changes_output(tmp_path, assets):
    """Guidance is live: scale 1 vs 7.5 must produce different latents."""
    outs = {}
    for scale in ("1.0", "7.5"):
        out = tmp_path / f"s{scale}"
        cli.main(["sample", "--task", "sd-tiny", "--n", "1", "--batch", "1",
                  "--ckpt", str(assets["unet_npz"]),
                  "--prompt", PROMPT, "--scale", scale, "--seed", "7",
                  "--tokenizer-dir", str(assets["dir"]),
                  "--clip-ckpt", str(assets["clip_npz"]),
                  "--vae-ckpt", str(assets["vae_npz"]),
                  "--out", str(out)])
        from PIL import Image

        outs[scale] = np.asarray(Image.open(next(out.glob("*.png"))))
    assert not np.array_equal(outs["1.0"], outs["7.5"])


def test_serve_sd_prompt_http(assets, monkeypatch):
    """CLI 'serve' on the SD task: prompt -> tokenizer -> CLIP cond per
    request, CFG sampling, PNG over HTTP (serving.py; no reference
    counterpart — its entry points are one-shot scripts)."""
    import base64
    import http.client
    import json
    import threading
    import time

    import qdiffusion_tpu.serving as serving

    captured = {}
    orig = serving.serve_http

    def capture(server, **kw):
        httpd = orig(server, **kw)
        captured["httpd"] = httpd
        captured["server"] = server
        return httpd

    monkeypatch.setattr(serving, "serve_http", capture)

    argv = ["serve", "--task", "sd-tiny", "--port", "0",
            "--buckets", "1,2", "--max-wait-ms", "5",
            "--scale", "7.5",
            "--tokenizer-dir", str(assets["dir"]),
            "--clip-ckpt", str(assets["clip_npz"]),
            "--vae-ckpt", str(assets["vae_npz"])]
    th = threading.Thread(target=cli.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(1200):
        if "httpd" in captured:
            break
        time.sleep(0.1)
    assert "httpd" in captured, "server did not come up"
    try:
        host, port = captured["httpd"].server_address
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request("POST", "/generate",
                     json.dumps({"n": 1, "seed": 3, "prompt": PROMPT}),
                     {"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert "images" in resp, resp
        png = base64.b64decode(resp["images"][0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        conn.request("GET", "/stats")
        assert json.loads(conn.getresponse().read())["completed"] == 1
    finally:
        captured["httpd"].shutdown()
        captured["server"].close()
