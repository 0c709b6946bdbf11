"""Build the fixture assets for an SD-scale calibration run on chip.

The reference's flagship calibration is SD v1.4 (scripts/txt2img.py:369-490
— cond/uncond trajectories through the frozen CLIP tower, then AdaRound +
block reconstruction over every UNet unit). Real checkpoints are external
artifacts (zero egress), so the on-chip SD-scale run uses random weights at
the REAL deployed sizes — the wall-time anatomy (unit count, distinct
structures, capture/recon per-unit costs) is what the run measures, and
none of it depends on the weight values.

Writes to --out (default runs/sd_assets):
  clip.npz  — full-size (ViT-L: 12 layers, d=768, vocab 49408) CLIP text
              tower, randomly initialised through transformers and
              converted with the production convert_hf_clip_text — the
              same path a real SD checkpoint takes.
  toks.npz  — cond/uncond token-id rows (BOS + random ids + EOS padding),
              the --token-ids format of make-cali-data/sample.

Then the documented runbook commands (docs/E2E_RUN.md, SD-scale section)
drive make-cali-data -> calibrate through the standard CLI.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/sd_assets")
    ap.add_argument("--prompts", type=int, default=1)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    from qdiffusion_tpu.models.clip_text import convert_hf_clip_text
    from qdiffusion_tpu.utils.checkpoints import save_nested

    torch.manual_seed(0)
    # SD v1's tower is ViT-L/14 (openai/clip-vit-large-patch14); the HF
    # *default* CLIPTextConfig is base CLIP (d=512, 8 heads) — spell the
    # ViT-L sizes out so the fixture matches the deployed geometry.
    cfg = HFConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu")
    hf = CLIPTextModel(cfg).eval()
    save_nested(out / "clip.npz", convert_hf_clip_text(hf.state_dict()))
    print(f"clip.npz: ViT-L text tower "
          f"({sum(p.numel() for p in hf.parameters()) / 1e6:.0f}M params)")

    rng = np.random.default_rng(0)
    v = hf.config.vocab_size
    bos, eos = v - 2, v - 1  # layout only; random weights have no vocab
    cond = np.full((args.prompts, 77), eos, np.int32)
    cond[:, 0] = bos
    n_words = rng.integers(5, 20, args.prompts)
    for i, n in enumerate(n_words):
        cond[i, 1:1 + n] = rng.integers(0, v - 2, n)
    uncond = np.full((1, 77), eos, np.int32)
    uncond[0, 0] = bos
    np.savez(out / "toks.npz", cond=cond, uncond=uncond)
    print(f"toks.npz: {args.prompts} cond row(s) + uncond -> {out}")


if __name__ == "__main__":
    main()
