"""Deterministic image+caption payload fixture — the north-rule input
table ``(image_id, bytes, w, h, fmt, caption, phash)`` (BASELINE.json
``input_hint``; FIXTURES.md §1).

The container has no image libraries, so the codecs here are small
deterministic stand-ins implemented with numpy+zlib and documented as
such (the task brief explicitly allows stubbing the decode step; here
we go one better — real encode/decode round-trips with the required
invariants, just in simple container formats):

* ``bmp``  — raw little-endian header + uint8 RGB pixels (lossless)
* ``png``  — the same payload zlib-compressed (lossless)
* ``jpeg`` — 8×8 block DCT quantization (lossy); quantization strength
  is tuned so decoded pixels satisfy PSNR ≥ 40 dB, the input_hint
  invariant for lossy formats

Pixels derive deterministically from the image id (seeded gradients +
sinusoids), so any executor can regenerate the ground truth without
shipping it. ``phash`` is a standard 64-bit DCT perceptual hash.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"MCSI"  # header: MAGIC, fmt u8, w u16, h u16


def pixels_for(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB uint8 pixels for an image id."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), dtype=np.float64)
    for c in range(3):
        fx, fy = rng.uniform(0.01, 0.15, size=2)
        px, py = rng.uniform(0, 2 * np.pi, size=2)
        grad = rng.uniform(0, 1) * xx / max(w, 1) + rng.uniform(0, 1) * yy / max(h, 1)
        wave = 0.5 + 0.5 * np.sin(2 * np.pi * (fx * xx + fy * yy) + px + py)
        img[:, :, c] = 255.0 * np.clip(0.55 * grad + 0.45 * wave, 0, 1)
    return img.astype(np.uint8)


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

_FMT_CODES = {"bmp": 0, "png": 1, "jpeg": 2}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}


def _header(fmt: str, w: int, h: int) -> bytes:
    return MAGIC + struct.pack("<BHH", _FMT_CODES[fmt], w, h)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT8 = _dct_matrix(8)
# flat quantization step; 6.0 keeps PSNR comfortably ≥ 40 dB while
# still being genuinely lossy (round-trip != identity)
_QSTEP = 6.0


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape[:2]
    head = _header(fmt, w, h)
    if fmt == "bmp":
        return head + pixels.tobytes()
    if fmt == "png":
        return head + zlib.compress(pixels.tobytes(), level=6)
    if fmt == "jpeg":
        ph, pw = -h % 8, -w % 8
        padded = np.pad(pixels.astype(np.float64) - 128.0,
                        ((0, ph), (0, pw), (0, 0)), mode="edge")
        hh, ww = padded.shape[:2]
        blocks = padded.reshape(hh // 8, 8, ww // 8, 8, 3).transpose(0, 2, 4, 1, 3)
        coef = np.einsum("ij,bckjl,lm->bckim", _DCT8, blocks, _DCT8.T)
        q = np.round(coef / _QSTEP).astype(np.int16)
        return head + struct.pack("<HH", hh, ww) + zlib.compress(q.tobytes(), level=6)
    raise ValueError(f"unknown fmt {fmt}")


def decode(data: bytes) -> tuple[str, np.ndarray]:
    if data[:4] != MAGIC:
        raise ValueError("bad magic")
    code, w, h = struct.unpack("<BHH", data[4:9])
    fmt = _FMT_NAMES[code]
    body = data[9:]
    if fmt == "bmp":
        return fmt, np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3).copy()
    if fmt == "png":
        raw = zlib.decompress(body)
        return fmt, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()
    hh, ww = struct.unpack("<HH", body[:4])
    q = np.frombuffer(zlib.decompress(body[4:]), dtype=np.int16).reshape(
        hh // 8, ww // 8, 3, 8, 8).astype(np.float64)
    coef = q * _QSTEP
    blocks = np.einsum("ij,bckjl,lm->bckim", _DCT8.T, coef, _DCT8)
    padded = blocks.transpose(0, 3, 1, 4, 2).reshape(hh, ww, 3) + 128.0
    return fmt, np.clip(np.round(padded[:h, :w]), 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """Standard 64-bit DCT perceptual hash: grayscale → 32×32 box
    resample → DCT-II → top-left 8×8 minus DC → median threshold."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.linspace(0, h, 33)).astype(int)
    xs = (np.linspace(0, w, 33)).astype(int)
    small = np.empty((32, 32))
    for i in range(32):
        for j in range(32):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            small[i, j] = block.mean()
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


# ---------------------------------------------------------------------------
# table generation
# ---------------------------------------------------------------------------


def generate_images(page_images: list[dict], seed: int = 42) -> list[dict]:
    """One payload row per referenced image: (image_id, bytes, w, h,
    fmt, caption, phash). Dimensions and format derive from the id so
    regeneration is location-independent."""
    rows = []
    fmts = ["png", "jpeg", "bmp"]
    for pi in page_images:
        image_id, caption = pi["image_id"], pi["caption"]
        idx = zlib.crc32(image_id.encode())
        w = 64 + (idx % 5) * 16
        h = 48 + ((idx >> 3) % 5) * 16
        fmt = fmts[idx % 3]
        px = pixels_for(image_id, w, h)
        rows.append({
            "image_id": image_id,
            "bytes": encode(px, fmt),
            "w": w, "h": h, "fmt": fmt,
            "caption": caption,
            "phash": np.int64(np.uint64(phash64(px))).item(),
        })
    return rows


def write_images_parquet(rows: list[dict], path: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    return path
