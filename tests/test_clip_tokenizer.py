"""CLIP BPE tokenizer: golden parity vs HF transformers CLIPTokenizer
built from the same vocab/merges files (offline — tiny synthetic vocab).

The reference encodes prompts with exactly this HF tokenizer
(/root/reference/ldm/modules/encoders/modules.py:137-162), so id-level
parity here means prompt-level parity of the whole SD conditioning path.
"""

import numpy as np
import pytest

from qdiffusion_tpu.models.clip_tokenizer import (
    CLIPTokenizer,
    clean_text,
    write_tiny_vocab,
)

WORDS = [
    "a", "photo", "photograph", "of", "an", "astronaut", "riding", "horse",
    "on", "mars", "the", "painting", "oil", "van", "gogh", "style", "cat",
    "dog", "highly", "detailed", "4k", "artstation", "trending",
]

PROMPTS = [
    "a photograph of an astronaut riding a horse",
    "An oil painting of a cat, trending on ArtStation!",
    "  A   PHOTO\tof a dog -- highly detailed, 4k  ",
    "the cat's dog'll ride",        # contraction suffixes in the pattern
    "unseenword zzz",               # falls back to byte/char tokens
    "",                             # empty prompt (the uncond input!)
    "café naïve résumé",  # accents: NFC, not stripped
]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    return write_tiny_vocab(d, WORDS + ["café", "naïve"])


@pytest.fixture(scope="module")
def ours(files):
    return CLIPTokenizer(files[0], files[1])


@pytest.fixture(scope="module")
def theirs(files):
    transformers = pytest.importorskip("transformers")
    return transformers.CLIPTokenizer(
        vocab_file=str(files[0]), merges_file=str(files[1]))


@pytest.mark.parametrize("prompt", PROMPTS)
def test_ids_match_hf(ours, theirs, prompt):
    ref = theirs([prompt], truncation=True, max_length=77,
                 padding="max_length")["input_ids"][0]
    got = ours([prompt], max_length=77)[0]
    assert got.tolist() == list(ref)


def test_batch_and_truncation(ours, theirs):
    long = " ".join(["astronaut riding a horse"] * 40)
    ref = theirs([long, "a cat"], truncation=True, max_length=77,
                 padding="max_length")["input_ids"]
    got = ours([long, "a cat"], max_length=77)
    assert got.shape == (2, 77)
    assert got.tolist() == [list(r) for r in ref]


def test_special_ids(ours, theirs):
    assert ours.bos_id == theirs.bos_token_id
    assert ours.eos_id == theirs.eos_token_id
    assert ours.pad_id == theirs.pad_token_id


def test_decode_roundtrip(ours):
    text = "a photo of a cat"
    ids = ours([text])[0]
    assert ours.decode(ids) == text


def test_clean_text():
    assert clean_text("  A \t B\nC ") == "a b c"
    assert clean_text("Café") == "café"  # NFC composes
    assert clean_text("\x00bad\x07ctl") == "badctl"


def test_empty_prompt_is_bos_eos_padding(ours):
    row = ours([""], max_length=8)[0]
    assert row.tolist() == [ours.bos_id, ours.eos_id] + [ours.pad_id] * 6


def test_dtype_and_shape(ours):
    out = ours("a cat", max_length=16)
    assert out.dtype == np.int32 and out.shape == (1, 16)
