"""Real WAV audio decode through the multimodal decoder seam (VERDICT r4
#3): actual RIFF/PCM bytes decode with the pure-stdlib ``wave`` path and
flow end-to-end through the ``audio_features`` mapInPandas plumbing with
exactly-predicted integer window features."""

import io
import struct
import wave

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_audio,
    decode_wav,
)


def make_wav(samples, n_channels=1, rate=8000, width=2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            w.writeframes(bytes((s + 128) & 0xFF for s in samples))
        elif width == 2:
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        else:
            w.writeframes(struct.pack(f"<{len(samples)}i", *samples))
    return buf.getvalue()


def test_decode_wav_roundtrip_16bit_stereo():
    # 2 channels x 100 frames of a deterministic ramp
    samples = [((i * 37) % 4001) - 2000 for i in range(200)]
    content = make_wav(samples, n_channels=2, rate=16000, width=2)
    n_ch, rate, out = decode_wav(content)
    assert (n_ch, rate) == (2, 16000)
    assert out == samples


def test_decode_wav_8bit_recentres_unsigned():
    samples = [-128, -1, 0, 1, 127]
    content = make_wav(samples, n_channels=1, rate=8000, width=1)
    assert decode_wav(content)[2] == samples


def test_decode_wav_32bit():
    samples = [-(2**30), 0, 2**30 - 1]
    content = make_wav(samples, width=4)
    assert decode_wav(content)[2] == samples


def test_decode_audio_dispatch():
    content = make_wav([0, 1, 2, 3])
    assert decode_audio(content, None)[2] == [0, 1, 2, 3]  # RIFF sniffing
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfbmp3ish", "mp3")


def test_audio_features_real_wav_end_to_end(spark):
    """Feed real RIFF bytes through the mapInPandas path; every window
    feature is predicted exactly by independent integer arithmetic."""
    rate, n_ch = 8000, 2
    # 1.25 s of stereo audio: 10_000 frames
    samples = [((i * 13) % 997) - 498 for i in range(10_000 * n_ch)]
    content = make_wav(samples, n_channels=n_ch, rate=rate, width=2)
    rows = [(7, "audio", "wav", bytearray(content), None, None, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    got = {
        r.window_start_ms: r
        for r in audio_features(
            media, window_ms=500, hop_ms=250, decoder=decode_audio
        ).collect()
    }
    duration_ms = 10_000 * 1000 // rate  # 1250 ms
    expected_starts = list(range(0, duration_ms, 250))
    assert sorted(got) == expected_starts
    for start in expected_starts:
        end = min(start + 500, duration_ms)
        f0, f1 = start * rate // 1000, end * rate // 1000
        w = samples[f0 * n_ch : f1 * n_ch]
        r = got[start]
        assert r.media_id == 7
        assert r.window_end_ms == end
        assert r.n_samples == len(w)
        assert r.sum_abs == sum(abs(s) for s in w)
        assert r.peak == max(abs(s) for s in w)
        assert r.energy == sum(s * s for s in w)


def test_audio_features_fake_fallback_and_filter(spark):
    """Without a decoder the deterministic fake keeps the plumbing
    testable; non-audio rows never reach the UDF."""
    rows = [
        (1, "audio", "bin", bytearray(b"payload"), None, None, None),
        (2, "image", "png", bytearray(b"img"), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_features(media, window_ms=4, hop_ms=4).collect()
    assert {r.media_id for r in out} == {1}
    import hashlib

    fake = [b - 128 for b in hashlib.md5(b"payload").digest()[:8]]
    # 8 samples at 1 kHz = 8 ms -> windows [0,4) and [4,8)
    assert [r.n_samples for r in sorted(out, key=lambda r: r.window_start_ms)] == [4, 4]
    assert sorted(r.sum_abs for r in out) == sorted(
        [sum(abs(s) for s in fake[:4]), sum(abs(s) for s in fake[4:])]
    )
