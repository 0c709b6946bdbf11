"""CLIP byte-level BPE tokenizer (pure Python, no network).

Reproduces the tokenization used by the reference's FrozenCLIPEmbedder
(/root/reference/ldm/modules/encoders/modules.py:137-162, which calls HF
``CLIPTokenizer(version).__call__(text, truncation=True, max_length=77,
padding="max_length")``): byte-level BPE over a lowercased,
whitespace-normalized string split by the CLIP regex, then
``<|startoftext|> ids <|endoftext|>`` padded with ``<|endoftext|>``.

The vocab (``vocab.json``) and merge table (``merges.txt``) are external
artifacts — the same two files HF ships for ``openai/clip-vit-large-patch14``
— documented in utils/ckpt_registry.py alongside the model checkpoints
(this environment has no network egress, so they cannot be bundled).

Text cleanup matches HF's no-ftfy path exactly (BasicTokenizer with
strip_accents=False, do_split_on_punc=False): control-char removal, CJK
spacing, NFC normalization, whitespace collapse, lowercase. With ftfy
installed HF would additionally fix mojibake; for clean input the two
paths produce identical ids.
"""

from __future__ import annotations

import json
import unicodedata
from functools import lru_cache
from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

try:  # the CLIP split pattern needs \p{L}/\p{N}; `regex` ships with HF
    import regex as _re
    _HAS_REGEX = True
except ImportError:  # pragma: no cover - regex is a transformers dep here
    import re as _re
    _HAS_REGEX = False

# Reference split pattern: openai/CLIP simple_tokenizer, kept verbatim by HF
# CLIPTokenizer (transformers/models/clip/tokenization_clip.py).
_CLIP_PATTERN = (
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
)


@lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode map (GPT-2/CLIP standard).

    Printable bytes map to themselves; the rest shift into U+0100.. so BPE
    never sees whitespace/control characters."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def clean_text(text: str) -> str:
    """HF CLIPTokenizer's no-ftfy cleanup: BasicTokenizer(strip_accents=False,
    do_split_on_punc=False) output re-joined with single spaces."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        out.append(" " if _is_whitespace(ch) else ch)
    text = "".join(out)
    text = "".join(f" {c} " if _is_cjk(ord(c)) else c for c in text)
    text = unicodedata.normalize("NFC", text)
    return " ".join(tok.lower() for tok in text.split())


class CLIPTokenizer:
    """Standalone CLIP BPE tokenizer.

    Parameters are the two artifact files; ids match HF's CLIPTokenizer for
    the same files (golden-tested in tests/test_clip_tokenizer.py).
    """

    def __init__(self, vocab_file: Union[str, Path],
                 merges_file: Union[str, Path],
                 bos_token: str = "<|startoftext|>",
                 eos_token: str = "<|endoftext|>"):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with open(merges_file, encoding="utf-8") as f:
            # HF quirk kept: skip the "#version" header and cap the table at
            # 49152-256-2 merges (the published file's exact length).
            merges = f.read().strip().split("\n")[1: 49152 - 256 - 2 + 1]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.bos_token, self.eos_token = bos_token, eos_token
        self.bos_id = self.encoder[bos_token]
        self.eos_id = self.encoder[eos_token]
        self.unk_id = self.eos_id  # HF: unk_token == eos_token
        self.pad_id = self.eos_id  # HF: pad_token == eos_token
        self._cache = {bos_token: bos_token, eos_token: eos_token}
        flags = _re.IGNORECASE if _HAS_REGEX else 0
        self._pat = _re.compile(_CLIP_PATTERN, flags)

    # -- BPE core ---------------------------------------------------------
    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        joined = " ".join(word)
        self._cache[token] = joined
        return joined

    def tokenize(self, text: str) -> List[str]:
        tokens: List[str] = []
        for tok in self._pat.findall(clean_text(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.bpe(tok).split(" "))
        return tokens

    def encode(self, text: str) -> List[int]:
        """Token ids WITHOUT bos/eos."""
        return [self.encoder.get(t, self.unk_id) for t in self.tokenize(text)]

    def __call__(self, texts: Union[str, Sequence[str]],
                 max_length: int = 77,
                 padding: bool = True) -> np.ndarray:
        """(B, max_length) int32 ids: bos + tokens[:max_length-2] + eos,
        padded with eos — HF's truncation=True, padding='max_length'
        behaviour that FrozenCLIPEmbedder relies on."""
        if isinstance(texts, str):
            texts = [texts]
        rows = []
        for text in texts:
            ids = self.encode(text)[: max_length - 2]
            row = [self.bos_id] + ids + [self.eos_id]
            if padding:
                row = row + [self.pad_id] * (max_length - len(row))
            rows.append(row)
        if not padding:
            width = max(len(r) for r in rows)
            rows = [r + [self.pad_id] * (width - len(r)) for r in rows]
        return np.asarray(rows, dtype=np.int32)

    def decode(self, ids: Sequence[int], skip_special: bool = True) -> str:
        specials = {self.bos_id, self.eos_id} if skip_special else set()
        text = "".join(self.decoder[int(i)] for i in ids
                       if int(i) not in specials)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()


def make_tiny_vocab(words: Sequence[str]):
    """Build a small (vocab, merges) pair covering `words` — used by tests
    and demos in this zero-egress environment. The vocab layout mirrors the
    published CLIP file: 256 byte tokens, 256 `x</w>` tokens, merged tokens
    in merge order, then the two specials."""
    byte_syms = list(bytes_to_unicode().values())
    vocab = list(byte_syms) + [s + "</w>" for s in byte_syms]
    ranks = {}

    def merge_word(chars: List[str]):
        while len(chars) > 1:
            # deterministically merge left-to-right, reusing known merges
            # first so shared prefixes tokenize consistently
            best = None
            for i in range(len(chars) - 1):
                pair = (chars[i], chars[i + 1])
                if pair in ranks:
                    r = ranks[pair]
                    if best is None or r < best[0]:
                        best = (r, i)
            if best is None:
                pair = (chars[0], chars[1])
                ranks[pair] = len(ranks)
                merged = pair[0] + pair[1]
                if merged not in vocab:
                    vocab.append(merged)
                chars = [merged] + chars[2:]
            else:
                _, i = best
                merged = chars[i] + chars[i + 1]
                if merged not in vocab:
                    vocab.append(merged)
                chars = chars[:i] + [merged] + chars[i + 2:]
        if chars[0] not in vocab:
            vocab.append(chars[0])

    for w in words:
        w = clean_text(w)
        if not w:
            continue
        chars = list(w[:-1]) + [w[-1] + "</w>"]
        merge_word(chars)

    vocab += ["<|startoftext|>", "<|endoftext|>"]
    encoder = {tok: i for i, tok in enumerate(vocab)}
    merges = ["#version: 0.2"] + [
        f"{a} {b}" for (a, b), _ in sorted(ranks.items(), key=lambda kv: kv[1])
    ]
    return encoder, merges


def write_tiny_vocab(dirpath: Union[str, Path], words: Sequence[str]):
    """Write tiny vocab.json/merges.txt for `words`; returns the two paths."""
    dirpath = Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)
    encoder, merges = make_tiny_vocab(words)
    vf, mf = dirpath / "vocab.json", dirpath / "merges.txt"
    vf.write_text(json.dumps(encoder, ensure_ascii=False), encoding="utf-8")
    mf.write_text("\n".join(merges) + "\n", encoding="utf-8")
    return vf, mf
