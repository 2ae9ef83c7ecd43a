"""Multimodal plumbing: audio feature extraction and video frame
sampling over opaque binary columns — exact vs a driver-side numpy
recomputation; opaque codecs surface as decode_ok=false rows (the
declared in-container stub), never task failures."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from meilisearchcrawler_spark.fixtures.mediagen import generate_media
from meilisearchcrawler_spark.operators.multimodal import (
    audio_features,
    decode_audio,
    decode_frames,
    frame_sample,
)

AUDIO_SCHEMA = ("media_id string, bytes binary, fmt string, "
                "sample_rate int, n_channels int, duration_ms int")
VIDEO_SCHEMA = ("media_id string, bytes binary, fmt string, "
                "w int, h int, fps double, n_frames int")


def test_audio_features_exact(spark):
    audio, _ = generate_media(n_audio=20, n_video=0)
    df = spark.createDataFrame(audio, schema=AUDIO_SCHEMA)
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert len(got) == 20
    n_wav = n_stereo = n_lofi = 0
    for row in audio:
        g = got[row["media_id"]]
        if row["fmt"] not in ("pcm16", "wav"):
            assert g["decode_ok"] is False and g["rms"] is None
            continue
        if row["fmt"] == "wav":
            # independent stdlib-wave oracle mirroring the kernel's
            # FULL wav semantics: sampwidth!=2 rejects, multi-channel
            # downmixes by rounded per-frame mean
            import io
            import wave

            with wave.open(io.BytesIO(row["bytes"]), "rb") as w:
                if w.getsampwidth() != 2:
                    n_lofi += 1
                    assert g["decode_ok"] is False and g["rms"] is None
                    continue
                x = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
                nch = w.getnchannels()
                if nch > 1:
                    n_stereo += 1
                    x = np.rint(
                        x.reshape(-1, nch).mean(axis=1)).astype("<i2")
                x = x.astype(np.float64)
            n_wav += 1
        else:
            x = np.frombuffer(row["bytes"], dtype="<i2").astype(np.float64)
        assert g["decode_ok"] is True
        assert g["n_samples"] == len(x)
        assert math.isclose(g["duration_ms"],
                            round(len(x) * 1000.0 / row["sample_rate"], 4))
        assert math.isclose(g["rms"], round(float(np.sqrt(np.mean(x ** 2))), 4))
        assert math.isclose(g["peak"], round(float(np.max(np.abs(x))), 4))
    # 4 opus + 1 8-bit wav reject; stereo + lofi container shapes LIVE
    assert sum(1 for r in got.values() if not r["decode_ok"]) == 5
    assert n_wav == 4 and n_stereo == 2 and n_lofi == 1


def test_frame_sampling_exact(spark):
    _, video = generate_media(n_audio=0, n_video=10)
    df = spark.createDataFrame(video, schema=VIDEO_SCHEMA)
    rows = frame_sample(df, every_n=3).collect()
    by_id: dict[str, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for v in video:
        got = sorted(by_id[v["media_id"]], key=lambda r: r["frame_idx"])
        if v["fmt"] != "grayraw":
            assert len(got) == 1 and got[0]["decode_ok"] is False
            continue
        frames = np.frombuffer(v["bytes"], dtype=np.uint8).reshape(
            v["n_frames"], v["h"], v["w"])
        want_idx = list(range(0, v["n_frames"], 3))
        assert [r["frame_idx"] for r in got] == want_idx
        for r in got:
            f = frames[r["frame_idx"]]
            assert r["frame_hash"] == hashlib.md5(f.tobytes()).hexdigest()
            assert math.isclose(r["mean_lum"], round(float(f.mean()), 4))
            assert math.isclose(r["ts_ms"],
                                round(r["frame_idx"] * 1000.0 / v["fps"], 4))


def test_stub_is_declared_not_silent():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00", "opus")
    with pytest.raises(NotImplementedError):
        decode_frames(b"\x00", "h264", 4, 4)


def test_wav_codec_semantics():
    """The WAV path is a real container decode: byte-identical samples
    to its pcm16 twin, stereo downmix by per-frame mean, 8-bit depth
    and malformed containers rejected (the latter as errors-as-data in
    the kernel)."""
    import io
    import wave

    import pytest

    from meilisearchcrawler_spark.fixtures.mediagen import make_audio, wav_wrap

    row = make_audio("twin0001")
    pcm = np.frombuffer(row["bytes"], dtype="<i2")
    got = decode_audio(wav_wrap(row["bytes"], row["sample_rate"]), "wav")
    assert np.array_equal(got, pcm)

    stereo = np.stack([pcm, np.roll(pcm, 1)], axis=1).astype("<i2")
    got2 = decode_audio(wav_wrap(stereo.tobytes(), row["sample_rate"],
                                 n_channels=2), "wav")
    want2 = np.rint(stereo.astype(np.float64).mean(axis=1)).astype("<i2")
    assert np.array_equal(got2, want2)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)           # 8-bit: unsupported depth
        w.setframerate(8000)
        w.writeframes(b"\x00\x01")
    with pytest.raises(NotImplementedError):
        decode_audio(buf.getvalue(), "wav")
    with pytest.raises(Exception):
        decode_audio(b"RIFFgarbage", "wav")   # malformed container
