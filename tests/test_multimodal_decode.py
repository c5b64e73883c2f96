"""Real media decoding: BMP / WAV payloads synthesized in-test (stdlib
only), decoded by the pure-python decoders, verified against
independently computed stats — both directly and through the Arrow
``mapInPandas`` pipeline stage.  Non-media payloads still take the
digest fallback (q41's oracle contract)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from bricolage_spark.operators import multimodal as M


def make_bmp(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP from an (h, w, 3) BGR uint8 array,
    bottom-up row order, 4-byte row alignment."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:  # BMP stores rows bottom-up
        body += row.tobytes() + b"\x00" * (stride - w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def make_wav(samples: np.ndarray, rate: int = 8000, n_ch: int = 1) -> bytes:
    """16-bit PCM WAV via the stdlib wave writer (independent of our parser)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_bmp_channel_means():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[..., 0] = 10  # B
    px[..., 1] = 20  # G
    px[..., 2] = 200  # R
    px[0, 0] = (0, 0, 0)
    feat = M.decode_bmp(make_bmp(px))
    kind, w, h, npix, b, g, r, a = feat
    assert (kind, w, h, npix, a) == (1.0, 3.0, 2.0, 6.0, 0.0)
    assert b == pytest.approx((10 * 5) / 6)
    assert g == pytest.approx((20 * 5) / 6)
    assert r == pytest.approx((200 * 5) / 6)


def test_decode_bmp_respects_row_padding():
    # width=3 → stride 12 ≠ 9: padding bytes must not leak into means.
    px = np.full((4, 3, 3), 255, dtype=np.uint8)
    feat = M.decode_bmp(make_bmp(px))
    assert feat[4:7] == [255.0, 255.0, 255.0]


def test_decode_wav_stats():
    t = np.arange(1600)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    payload = make_wav(samples)
    kind, n_ch, rate, n, rms, peak, mean, zcr = M.decode_wav(payload)
    assert (kind, n_ch, rate, n) == (2.0, 1.0, 8000.0, 1600.0)
    x = samples.astype(np.float64) / 32768.0
    assert rms == pytest.approx(float(np.sqrt(np.mean(x * x))), rel=1e-12)
    assert peak == pytest.approx(float(np.max(np.abs(x))), rel=1e-12)
    assert zcr == pytest.approx(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))


def test_decode_media_dispatch_and_fallback():
    bmp = make_bmp(np.zeros((1, 1, 3), dtype=np.uint8))
    assert M.decode_media(bmp)[0] == 1.0
    wav = make_wav(np.zeros(4, dtype=np.int64))
    assert M.decode_media(wav)[0] == 2.0
    # text payload → digest fallback (q41 contract unchanged)
    assert M.decode_media(b"hello world") == M._fake_feature(b"hello world")
    # known magic but unsupported variant → fallback, not a crash
    truncated = bmp[:20]
    assert M.decode_media(truncated) == M._fake_feature(truncated)


def test_real_decode_through_spark_pipeline(spark):
    bmp = make_bmp(np.full((2, 2, 3), 100, dtype=np.uint8))
    wav = make_wav((np.ones(8) * 3276).astype(np.int64), rate=16000)
    rows = [
        (1, bytearray(bmp), "image/bmp", len(bmp)),
        (2, bytearray(wav), "audio/wav", len(wav)),
        (3, bytearray(b"plain text"), "text/plain", 10),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    feats = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert feats[1][0] == 1.0 and feats[1][4] == pytest.approx(100.0)
    assert feats[2][0] == 2.0 and feats[2][2] == 16000.0
    assert feats[3] == M._fake_feature(b"plain text")
