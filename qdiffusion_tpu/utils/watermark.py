"""Invisible watermark: embed/extract bit strings in generated images.

The reference stamps every Stable-Diffusion output with an invisible
watermark through the external `invisible-watermark` package
(scripts/txt2img.py:8,77-81,493-495,560-584: WatermarkEncoder 'bytes'
payload, 'dwtDct' method). That package is unavailable here (zero-egress
environment), so this is a clean-room equivalent of the same family of
scheme — 1-level Haar DWT, 4x4 block DCT on the LL subband of the chroma
channels, quantization-index modulation of the strongest AC coefficient —
with an extractor included (the reference ships no decoder at all).

Pure numpy (no cv2/pywt/scipy); operates on uint8 RGB (H, W, 3).
"""

from __future__ import annotations

import numpy as np

# BT.601 RGB<->YUV (the colorspace the reference's cv2 pipeline uses)
_RGB2YUV = np.array([[0.299, 0.587, 0.114],
                     [-0.14713, -0.28886, 0.436],
                     [0.615, -0.51499, -0.10001]], np.float64)
_YUV2RGB = np.linalg.inv(_RGB2YUV)

# 4x4 DCT-II basis (orthonormal)
_K = 4
_DCT = np.zeros((_K, _K))
for _i in range(_K):
    for _j in range(_K):
        _DCT[_i, _j] = np.cos(np.pi * (_j + 0.5) * _i / _K) * np.sqrt(2.0 / _K)
_DCT[0] /= np.sqrt(2.0)


def text_to_bits(text: str) -> np.ndarray:
    data = text.encode("utf-8")
    return np.unpackbits(np.frombuffer(data, np.uint8))


def bits_to_text(bits: np.ndarray) -> str:
    by = np.packbits(np.asarray(bits, np.uint8))
    return by.tobytes().decode("utf-8", errors="replace")


def _haar2(x: np.ndarray):
    """1-level 2-D Haar DWT -> (LL, (LH, HL, HH)); even dims required."""
    a = (x[0::2] + x[1::2]) / 2.0
    d = (x[0::2] - x[1::2]) / 2.0
    ll = (a[:, 0::2] + a[:, 1::2]) / 2.0
    lh = (a[:, 0::2] - a[:, 1::2]) / 2.0
    hl = (d[:, 0::2] + d[:, 1::2]) / 2.0
    hh = (d[:, 0::2] - d[:, 1::2]) / 2.0
    return ll, (lh, hl, hh)


def _ihaar2(ll, bands):
    lh, hl, hh = bands
    a = np.empty((ll.shape[0], 2 * ll.shape[1]))
    d = np.empty_like(a)
    a[:, 0::2] = ll + lh
    a[:, 1::2] = ll - lh
    d[:, 0::2] = hl + hh
    d[:, 1::2] = hl - hh
    x = np.empty((2 * ll.shape[0], a.shape[1]))
    x[0::2] = a + d
    x[1::2] = a - d
    return x


def _blocks(frame: np.ndarray):
    """(R*4, C*4) -> (R*C, 4, 4) view-free block stack and the shape."""
    R, C = frame.shape[0] // _K, frame.shape[1] // _K
    b = frame[: R * _K, : C * _K].reshape(R, _K, C, _K).swapaxes(1, 2)
    return b.reshape(R * C, _K, _K), (R, C)


def _unblocks(blocks: np.ndarray, shape):
    R, C = shape
    return blocks.reshape(R, C, _K, _K).swapaxes(1, 2).reshape(R * _K, C * _K)


def _embed_frame(frame: np.ndarray, bits: np.ndarray, scale: float):
    """QIM-embed bits cyclically, one bit per 4x4 DCT block: snap the
    strongest AC coefficient to (n + 0.25 + 0.5*bit) * scale, preserving
    its sign (the reference package's diffuse-dct rule)."""
    blk, shape = _blocks(frame)
    dct = _DCT @ blk @ _DCT.T
    flat = dct.reshape(len(dct), -1)
    pos = np.abs(flat[:, 1:]).argmax(axis=1) + 1  # strongest AC coeff
    val = flat[np.arange(len(flat)), pos]
    b = bits[np.arange(len(flat)) % len(bits)]
    mag = np.abs(val)
    new = (np.floor(mag / scale) + 0.25 + 0.5 * b) * scale
    flat[np.arange(len(flat)), pos] = np.sign(val + 1e-12) * new
    out = _DCT.T @ flat.reshape(-1, _K, _K) @ _DCT
    return _unblocks(out, shape)


def _extract_frame(frame: np.ndarray, wm_len: int, scale: float):
    """Per-block soft votes: fractional part of |coeff|/scale > 0.5."""
    blk, _ = _blocks(frame)
    dct = _DCT @ blk @ _DCT.T
    flat = dct.reshape(len(dct), -1)
    pos = np.abs(flat[:, 1:]).argmax(axis=1) + 1
    val = np.abs(flat[np.arange(len(flat)), pos])
    frac = np.mod(val / scale, 1.0)
    votes = (frac > 0.5).astype(np.float64)
    sums = np.zeros(wm_len)
    cnts = np.zeros(wm_len)
    idx = np.arange(len(votes)) % wm_len
    np.add.at(sums, idx, votes)
    np.add.at(cnts, idx, 1)
    return sums / np.maximum(cnts, 1)


def embed_watermark(img: np.ndarray, payload: str, scale: float = 36.0
                    ) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> watermarked uint8 RGB. Embeds in the U and V
    chroma LL subbands (luma untouched — invisible), like the reference
    package's default channel scales."""
    img = np.asarray(img)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    bits = text_to_bits(payload)
    H, W = img.shape[:2]
    H8, W8 = H // 8 * 8, W // 8 * 8  # DWT halves once, blocks need /4
    if H8 < 8 or W8 < 8:
        raise ValueError(f"image too small to watermark: {img.shape}")
    yuv = img.astype(np.float64) @ _RGB2YUV.T
    for ch in (1, 2):
        ll, bands = _haar2(yuv[:H8, :W8, ch])
        ll = _embed_frame(ll, bits, scale)
        yuv[:H8, :W8, ch] = _ihaar2(ll, bands)
    out = yuv @ _YUV2RGB.T
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def extract_watermark(img: np.ndarray, payload_len_bytes: int,
                      scale: float = 36.0) -> str:
    """Recover a payload embedded by embed_watermark (majority vote over
    blocks and both chroma channels)."""
    img = np.asarray(img)
    wm_len = payload_len_bytes * 8
    H, W = img.shape[:2]
    H8, W8 = H // 8 * 8, W // 8 * 8
    yuv = img.astype(np.float64) @ _RGB2YUV.T
    acc = np.zeros(wm_len)
    for ch in (1, 2):
        ll, _ = _haar2(yuv[:H8, :W8, ch])
        acc += _extract_frame(ll, wm_len, scale)
    return bits_to_text((acc / 2.0 > 0.5).astype(np.uint8))
