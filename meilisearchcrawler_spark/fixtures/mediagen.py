"""Deterministic audio/video payload fixtures (multimodal columns).

The task brief's multimodal tier: media ride as opaque ``binary``
columns with typed metadata. Real codec libraries are absent from this
container, so payloads use two trivially-decodable deterministic
formats — ``pcm16`` (headerless little-endian PCM, a seeded sine mix)
and ``grayraw`` (concatenated w×h single-byte frames) — plus opaque
``opus``/``h264`` stand-ins whose decode is a declared stub. Everything
derives from the media_id, so fixtures regenerate bit-identically.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _seed_of(media_id: str) -> int:
    return int.from_bytes(hashlib.md5(media_id.encode()).digest()[:4], "little")


def make_audio(media_id: str, sample_rate: int = 8000,
               duration_ms: int = 250) -> dict:
    """One pcm16 audio row: a two-tone sine mix seeded by media_id."""
    rng = np.random.default_rng(_seed_of(media_id))
    n = sample_rate * duration_ms // 1000
    t = np.arange(n, dtype=np.float64) / sample_rate
    f1, f2 = rng.uniform(100, 1000), rng.uniform(1000, 3000)
    amp = rng.uniform(0.2, 0.8)
    wave = amp * (np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t))
    pcm = np.clip(wave * 16384, -32768, 32767).astype("<i2")
    return {"media_id": media_id, "bytes": pcm.tobytes(), "fmt": "pcm16",
            "sample_rate": sample_rate, "n_channels": 1,
            "duration_ms": duration_ms}


def make_video(media_id: str, w: int = 32, h: int = 24, fps: float = 10.0,
               n_frames: int = 12) -> dict:
    """One grayraw video row: n_frames deterministic w×h gray frames."""
    rng = np.random.default_rng(_seed_of(media_id))
    frames = rng.integers(0, 256, size=(n_frames, h, w), dtype=np.uint8)
    return {"media_id": media_id, "bytes": frames.tobytes(), "fmt": "grayraw",
            "w": w, "h": h, "fps": fps, "n_frames": n_frames}


def wav_wrap(pcm_payload: bytes, sample_rate: int,
             n_channels: int = 1, sampwidth: int = 2) -> bytes:
    """Wrap raw PCM in a RIFF/WAVE container via the stdlib ``wave``
    writer — the real-format twin of a pcm16 row (same samples, so
    decode equality is the oracle). ``sampwidth=1`` builds the 8-bit
    container the decoder must REJECT (decode_ok=false)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm_payload)
    return buf.getvalue()


def generate_media(n_audio: int = 20, n_video: int = 10,
                   opaque_every: int = 5,
                   wav_every: int = 3) -> tuple[list[dict], list[dict]]:
    """Audio + video fixture rows; every ``opaque_every``-th row gets an
    opaque codec label (decode must go through the declared stub), and
    every ``wav_every``-th remaining audio row ships as a real WAV
    container holding the identical samples."""
    audio = []
    wav_idx = 0
    for i in range(n_audio):
        row = make_audio(f"aud{i:04d}", duration_ms=150 + 25 * (i % 5))
        if opaque_every and i % opaque_every == opaque_every - 1:
            row["fmt"] = "opus"
        elif wav_every and i % wav_every == wav_every - 1:
            # cycle the wav container shapes so the decode kernel's
            # full wav semantics are LIVE in the fixture (round-4
            # advisor item — previously every wav row was mono/16-bit
            # and the downmix + sampwidth-rejection paths were dead
            # code in the value-hashed q92): every 4th wav row is an
            # 8-bit container (decode_ok=false), every 2nd is stereo
            # (per-frame-mean downmix), the rest mono 16-bit.
            wav_idx += 1
            pcm = np.frombuffer(row["bytes"], dtype="<i2")
            if wav_idx % 4 == 3:
                u8 = ((pcm.astype(np.int32) >> 8) + 128).astype(np.uint8)
                row["bytes"] = wav_wrap(u8.tobytes(), row["sample_rate"],
                                        sampwidth=1)
            elif wav_idx % 2 == 0:
                st = np.stack([pcm, np.roll(pcm, 1)], axis=1).astype("<i2")
                row["bytes"] = wav_wrap(st.tobytes(), row["sample_rate"],
                                        n_channels=2)
                row["n_channels"] = 2
            else:
                row["bytes"] = wav_wrap(pcm.tobytes(), row["sample_rate"])
            row["fmt"] = "wav"
        audio.append(row)
    video = []
    for i in range(n_video):
        row = make_video(f"vid{i:04d}", n_frames=8 + (i % 7))
        if opaque_every and i % opaque_every == opaque_every - 1:
            row["fmt"] = "h264"
        video.append(row)
    return audio, video
