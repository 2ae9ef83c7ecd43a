"""Engine-owned image codec — the DECODE side of the payload format.

The payload container format (``MCSI`` header + bmp/png/jpeg-standin
bodies, FIXTURES.md §1) is a spec with two implementations that must
NOT share code (round-4 verdict next-step #6): the fixture encoder
(``fixtures/imagegen.py`` — test/bench side, also the regenerable
ground truth) and THIS module, the decoder the engine operators run.
Keeping them separate means an encoder bug and a decoder bug cannot
cancel out — the cross-implementation round-trip tests in
``tests/test_images.py`` (decode equality on lossless, PSNR ≥ 40 dB on
the lossy stand-in, phash bit-equality on identical pixels) would
catch either.

Format spec being implemented (same constants as the encoder, by
specification not by import):

* header: ``b"MCSI"`` + ``<BHH`` (fmt code, width, height); fmt codes
  0=bmp, 1=png, 2=jpeg
* ``bmp``: raw uint8 RGB, row-major, h×w×3
* ``png``: the same payload zlib-compressed
* ``jpeg``: ``<HH`` padded dims, then zlib'd int16 quantized 8×8
  DCT-II coefficients laid out as (hh/8, ww/8, 3, 8, 8); dequantize
  with the flat step 6.0, inverse-transform per block, +128, crop to
  (h, w), clip to uint8

In a real deployment this module is where PIL/libjpeg plugs in behind
the same function signatures (reference stores image URL+caption only,
crawler.py:604-628; decoding pixels at all is this repo's input_hint
extension).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"MCSI"
_FMT_NAMES = {0: "bmp", 1: "png", 2: "jpeg"}
_QSTEP = 6.0  # flat quantization step of the jpeg stand-in (spec)


def _dct(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (type-II rows, scaled so the
    transform is orthogonal — the standard JPEG/phash basis)."""
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT8 = _dct(8)
_DCT32 = _dct(32)


def decode(data: bytes) -> tuple[str, np.ndarray]:
    """Decode one payload to ``(fmt, h×w×3 uint8 pixels)``. Raises
    ``ValueError`` on malformed input (bad magic, unknown format code,
    truncated body) — callers running inside map kernels turn that
    into a ``decode_ok=false`` row, never a task failure."""
    if len(data) < 9 or data[:4] != _MAGIC:
        raise ValueError("imagecodec: bad magic/short header")
    code, w, h = struct.unpack("<BHH", data[4:9])
    if code not in _FMT_NAMES:
        raise ValueError(f"imagecodec: unknown format code {code}")
    fmt, body = _FMT_NAMES[code], data[9:]
    if fmt in ("bmp", "png"):
        raw = body if fmt == "bmp" else zlib.decompress(body)
        if len(raw) != h * w * 3:
            raise ValueError("imagecodec: body/dimension mismatch")
        return fmt, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()
    if len(body) < 4:
        raise ValueError("imagecodec: truncated jpeg body")
    hh, ww = struct.unpack("<HH", body[:4])
    if hh % 8 or ww % 8 or hh < h or ww < w:
        raise ValueError("imagecodec: bad padded dims")
    q = np.frombuffer(zlib.decompress(body[4:]), dtype=np.int16)
    if q.size != hh * ww * 3:
        raise ValueError("imagecodec: coefficient count mismatch")
    coef = q.reshape(hh // 8, ww // 8, 3, 8, 8).astype(np.float64) * _QSTEP
    # inverse orthonormal DCT-II per block: Bᵀ · C · B, batched over
    # (block_row, block_col, channel) via matmul broadcasting
    blocks = _DCT8.T @ coef @ _DCT8
    padded = blocks.transpose(0, 3, 1, 4, 2).reshape(hh, ww, 3) + 128.0
    return fmt, np.clip(np.round(padded[:h, :w]), 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (peak = 255); inf when equal."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """Standard 64-bit DCT perceptual hash: grayscale → 32×32 box
    resample → DCT-II → top-left 8×8 minus DC → median threshold.
    Bit-for-bit deterministic given identical pixels (the stored-phash
    recompute check in :func:`~.images.decode_and_verify` relies on
    it; cross-implementation bit-equality vs the fixture encoder's
    hash is pinned in tests)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.linspace(0, h, 33)).astype(int)
    xs = (np.linspace(0, w, 33)).astype(int)
    small = np.empty((32, 32))
    for i in range(32):
        for j in range(32):
            cell = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                        xs[j]:max(xs[j + 1], xs[j] + 1)]
            # bit-identical to cell.mean() (numpy's _mean IS
            # umr_sum/rcount) at ~half the per-call overhead — this
            # 1024-cell loop was 84% of the image verify stage's
            # per-row profile (round-6)
            small[i, j] = cell.sum() / cell.size
    coef = _DCT32 @ small @ _DCT32.T
    low = coef[:8, :8].flatten()[1:]
    med = np.median(low)
    bits = 0
    for idx, v in enumerate(low):
        if v > med:
            bits |= 1 << idx
    return bits


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
