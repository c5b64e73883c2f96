"""Real media decoding: BMP / WAV payloads synthesized in-test (stdlib
only), decoded by the pure-python decoders, verified against
independently computed stats — both directly and through the Arrow
``mapInPandas`` pipeline stage.  Non-media payloads still take the
digest fallback (q41's oracle contract)."""

from __future__ import annotations

import io
import struct
import wave
import zlib

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


def make_png(
    pixels: np.ndarray, color_type: int, filters: list[int] | None = None,
    palette: np.ndarray | None = None,
) -> bytes:
    """Independent PNG encoder (forward filtering + zlib), so the decoder
    is verified against the spec rather than against itself.  ``pixels``
    is (h, w, ch) uint8 — for palette images (color_type 3) ch=1 holds
    palette indices and ``palette`` is the (n, 3) RGB table."""
    h, w, ch = pixels.shape
    filters = filters if filters is not None else [0] * h
    flat = pixels.reshape(h, w * ch).astype(np.int64)
    stride, bpp = w * ch, ch
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for y, f in zip(range(h), filters):
        raw = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), raw[:-bpp]]) if stride > bpp else np.zeros(stride, dtype=np.int64)
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]]) if stride > bpp else np.zeros(stride, dtype=np.int64)
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw - left
        elif f == 2:
            filt = raw - prior
        elif f == 3:
            filt = raw - ((left + prior) >> 1)
        else:  # Paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            filt = raw - pred
        out += bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes()
        prior = raw
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += chunk(b"IDAT", zlib.compress(bytes(out)))
    body += chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


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


def test_decode_png_all_filter_types():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    # one row per filter type: None, Sub, Up, Average, Paeth
    payload = make_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
    kind, w, h, npix, r, g, b, a = M.decode_png(payload)
    assert (kind, w, h, npix, a) == (3.0, 4.0, 5.0, 20.0, 0.0)
    means = px.astype(np.float64).mean(axis=(0, 1))
    assert (r, g, b) == (
        pytest.approx(means[0]), pytest.approx(means[1]), pytest.approx(means[2])
    )


def test_decode_png_rgba_gray_palette():
    rng = np.random.default_rng(11)
    # RGBA with mixed filters
    px = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    feat = M.decode_png(make_png(px, color_type=6, filters=[4, 3, 1]))
    means = px.astype(np.float64).mean(axis=(0, 1))
    assert feat[4:8] == [pytest.approx(m) for m in means]
    # grayscale: r=g=b=mean, alpha 0
    gray = rng.integers(0, 256, size=(4, 2, 1), dtype=np.uint8)
    feat = M.decode_png(make_png(gray, color_type=0, filters=[0, 2, 1, 4]))
    gm = float(gray.astype(np.float64).mean())
    assert feat[4:8] == [pytest.approx(gm)] * 3 + [0.0]
    # palette: indices resolve through PLTE to RGB means
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[[0], [1]], [[2], [0]]], dtype=np.uint8)  # 2x2
    feat = M.decode_png(make_png(idx, color_type=3, palette=palette))
    assert feat[4:7] == [
        pytest.approx(255 * 2 / 4), pytest.approx(255 / 4), pytest.approx(255 / 4)
    ]


def test_decode_png_unsupported_falls_back():
    # interlaced flag set → ValueError from decode_png, digest fallback in dispatch
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(make_png(px, color_type=2))
    ihdr_off = 8 + 8  # magic + len/type
    payload[ihdr_off + 12] = 1  # interlace byte inside IHDR
    payload = bytes(payload)
    with pytest.raises(ValueError):
        M.decode_png(payload)
    assert M.decode_media(payload) == M._fake_feature(payload)
    # corrupt IDAT (zlib error) must also fall back, not crash
    garbage = make_png(px, color_type=2)[:41] + b"\x00" * 20
    assert M.decode_media(garbage) == M._fake_feature(garbage)


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
    png = make_png(np.full((2, 2, 3), 50, dtype=np.uint8), color_type=2)
    rows = [
        (1, bytearray(bmp), "image/bmp", len(bmp)),
        (2, bytearray(wav), "audio/wav", len(wav)),
        (3, bytearray(b"plain text"), "text/plain", 10),
        (4, bytearray(png), "image/png", len(png)),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    feats = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert feats[1][0] == 1.0 and feats[1][4] == pytest.approx(100.0)
    assert feats[2][0] == 2.0 and feats[2][2] == 16000.0
    assert feats[3] == M._fake_feature(b"plain text")
    assert feats[4][0] == 3.0 and feats[4][4] == pytest.approx(50.0)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def make_apng(frames: list[np.ndarray]) -> bytes:
    """Independent APNG encoder: acTL + per-frame fcTL, first frame as
    IDAT, the rest as sequence-numbered fdAT (all frames full-size,
    filter 0)."""
    h, w, ch = frames[0].shape
    assert ch == 3
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, fr in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0
        )  # seq, w, h, x, y, delay 1/10s, dispose none, blend source
        out += _chunk(b"fcTL", fctl)
        seq += 1
        raw = b"".join(b"\x00" + fr[y].tobytes() for y in range(h))
        data = zlib.compress(raw)
        if i == 0:
            out += _chunk(b"IDAT", data)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_resize_bmp_nearest_neighbor():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2, :2] = (255, 0, 0)   # BGR quadrants in file order
    px[:2, 2:] = (0, 255, 0)
    px[2:, :2] = (0, 0, 255)
    px[2:, 2:] = (255, 255, 255)
    small = M._nn_resize(M.decode_pixels(make_bmp(px)), 2, 2)
    # decode_pixels returns RGB; BMP file stored BGR, so channels flip
    assert small.shape == (2, 2, 3)
    assert tuple(small[0, 0]) == (0, 0, 255)      # was BGR (255,0,0)
    assert tuple(small[1, 1]) == (255, 255, 255)
    # re-encode and decode round-trips exactly
    again = M.decode_pixels(M.encode_bmp(small))
    assert np.array_equal(small, again)


def test_split_apng_frames_and_still_png():
    f0 = np.full((3, 4, 3), 10, dtype=np.uint8)
    f1 = np.full((3, 4, 3), 100, dtype=np.uint8)
    f2 = np.full((3, 4, 3), 200, dtype=np.uint8)
    apng = make_apng([f0, f1, f2])
    frames = M.split_apng_frames(apng)
    assert len(frames) == 3
    for fp, val in zip(frames, (10.0, 100.0, 200.0)):
        feat = M.decode_png(fp)
        assert feat[:4] == [3.0, 4.0, 3.0, 12.0]
        assert feat[4] == pytest.approx(val)
    # a still PNG is its own single frame
    still = make_png(f0, color_type=2)
    assert M.split_apng_frames(still) == [still]


def test_resize_and_sample_stages_through_spark(spark):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[..., 0] = 200  # B plane in BMP file order
    bmp = make_bmp(img)
    png = make_png(np.full((6, 6, 3), 77, dtype=np.uint8), color_type=2)
    apng = make_apng([
        np.full((2, 2, 3), v, dtype=np.uint8) for v in (0, 60, 120, 180)
    ])
    rows = [
        (1, bytearray(bmp), "image/bmp", len(bmp)),
        (2, bytearray(png), "image/png", len(png)),
        (3, bytearray(b"not media"), "text/plain", 9),
        (4, bytearray(apng), "image/apng", len(apng)),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)

    resized = {r.media_id: r for r in M.resize_images(media, 2, 2).collect()}
    assert resized[1].resized and resized[1].media_type == "image/bmp"
    out_px = M.decode_pixels(bytes(resized[1].payload))
    assert out_px.shape == (2, 2, 3) and tuple(out_px[0, 0]) == (0, 0, 200)
    assert resized[2].resized  # png decoded, re-encoded as bmp
    assert M.decode_pixels(bytes(resized[2].payload)).mean() == pytest.approx(77)
    assert not resized[3].resized and bytes(resized[3].payload) == b"not media"

    frames = M.sample_frames(media, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].decoded  # still bmp
    assert len(by_id[3]) == 1 and not by_id[3][0].decoded  # text fallback
    ap = sorted(by_id[4], key=lambda r: r.frame_index)
    assert [r.frame_index for r in ap] == [0, 2]
    assert all(r.n_frames == 4 for r in ap)
    means = [M.decode_png(bytes(r.payload))[4] for r in ap]
    assert means == [pytest.approx(0.0), pytest.approx(120.0)]


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    import struct as _s

    return _box(btype, _s.pack(">B3x", version) + payload)


def _tiny_mp4(samples, chunks, stsc_runs, sync=None, timescale=600):
    """Hand-assemble a minimal ISO-BMFF file: ftyp + mdat carrying the
    coded samples laid out per ``chunks`` (list of sample-index lists),
    followed by moov with real stsd/stts/stsc/stsz/stco/stss tables."""
    import struct as _s

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # lay out mdat: chunks in order, samples contiguous within a chunk
    mdat_payload = bytearray()
    chunk_offsets = []
    base = len(ftyp) + 8  # mdat payload starts after its own header
    for ch in chunks:
        chunk_offsets.append(base + len(mdat_payload))
        for si in ch:
            mdat_payload += samples[si]
    mdat = _box(b"mdat", bytes(mdat_payload))

    n = len(samples)
    stsd = _full(b"stsd", _s.pack(">I", 1) + _box(b"avc1", b"\x00" * 8))
    stts = _full(b"stts", _s.pack(">III", 1, n, 100))
    stsc = _full(
        b"stsc",
        _s.pack(">I", len(stsc_runs))
        + b"".join(_s.pack(">III", fc, spc, 1) for fc, spc in stsc_runs),
    )
    stsz = _full(
        b"stsz",
        _s.pack(">II", 0, n) + b"".join(_s.pack(">I", len(x)) for x in samples),
    )
    stco = _full(
        b"stco",
        _s.pack(">I", len(chunk_offsets))
        + b"".join(_s.pack(">I", o) for o in chunk_offsets),
    )
    boxes = stsd + stts + stsc + stsz + stco
    if sync is not None:
        boxes += _full(
            b"stss",
            _s.pack(">I", len(sync)) + b"".join(_s.pack(">I", i) for i in sync),
        )
    stbl = _box(b"stbl", boxes)
    minf = _box(b"minf", stbl)
    mdhd = _full(
        b"mdhd", _s.pack(">IIII", 0, 0, timescale, n * 100) + b"\x00" * 4
    )
    hdlr = _full(b"hdlr", _s.pack(">I", 0) + b"vide" + b"\x00" * 12)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov


def test_mp4_sample_table_parsing_and_frame_split():
    """The BMFF walker decodes real sample tables: uneven chunk layout
    (stsc runs), per-sample sizes, sync list, codec fourcc — and
    split_mp4_frames recovers the exact coded frame bytes."""
    samples = [b"frameAA", b"frB", b"frameCCCC", b"frD", b"frameEE"]
    # chunk 1: samples 0,1; chunk 2: samples 2,3; chunk 3: sample 4
    mp4 = _tiny_mp4(
        samples,
        chunks=[[0, 1], [2, 3], [4]],
        stsc_runs=[(1, 2), (3, 1)],  # chunks 1-2 carry 2 samples, 3 carries 1
        sync=[1, 4],
    )
    info = M.parse_mp4_samples(mp4)
    assert info is not None
    assert info["codec"] == "avc1"
    assert info["timescale"] == 600
    assert info["n_samples"] == 5
    assert info["durations"] == [100] * 5
    assert info["sync"] == [1, 4]
    assert M.split_mp4_frames(mp4) == samples
    # no stss box -> every sample is a sync sample (spec default)
    mp4_all = _tiny_mp4(samples, [[0, 1, 2, 3, 4]], [(1, 5)])
    assert M.parse_mp4_samples(mp4_all)["sync"] == [1, 2, 3, 4, 5]
    # malformed payloads refuse instead of mis-slicing
    assert M.parse_mp4_samples(b"\x00\x00\x00\x08free") is None
    with pytest.raises(ValueError):
        M.split_mp4_frames(mp4[: len(mp4) // 2] )


@pytest.mark.spark
def test_sample_frames_extracts_mp4_access_units(spark):
    """sample_frames emits one row per sampled CODED frame for MP4
    payloads — real count/index/payload from the container tables,
    decoded=false because pixel decode needs the absent codec."""
    samples = [b"k0-frame", b"d1", b"d2-bigger", b"k3f", b"d4-last"]
    mp4 = _tiny_mp4(samples, [[0, 1, 2], [3, 4]], [(1, 3), (2, 2)])
    rows = [(9, bytearray(mp4), "video/mp4", len(mp4))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = sorted(
        M.sample_frames(media, every_n=2).collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.frame_index for r in out] == [0, 2, 4]
    assert all(r.n_frames == 5 for r in out)
    assert [bytes(r.payload) for r in out] == [samples[0], samples[2], samples[4]]
    assert all(not r.decoded for r in out)  # coded access units, no codec


def test_sample_frames_decodes_motion_jpeg_pixels(spark):
    """Motion-JPEG video (every MP4 sample is a complete JPEG) decodes
    to PIXELS end-to-end: sample_frames marks the frames decodable and
    the native JPEG decoder extracts the same features from a sampled
    frame as from the standalone image — the coded-video stand-in now
    covers only INTER-coded bitstreams."""
    import numpy as np
    from test_jpeg_decode import encode_jpeg

    rng = np.random.default_rng(7)
    jpegs = [
        encode_jpeg(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
        for _ in range(3)
    ]
    mp4 = _tiny_mp4(jpegs, [[0, 1], [2]], [(1, 2), (2, 1)])
    rows = [(5, bytearray(mp4), "video/mjpeg", len(mp4))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = sorted(
        M.sample_frames(media).collect(), key=lambda r: r.frame_index
    )
    assert [r.frame_index for r in out] == [0, 1, 2]
    assert all(r.n_frames == 3 for r in out)
    assert all(r.decoded for r in out)  # every access unit IS a JPEG
    # pixel decode of a sampled frame == pixel decode of the image
    got = M.decode_media(bytes(out[1].payload))
    want = M.decode_media(jpegs[1])
    assert got == want and len(got) > 0
    # a mixed container (one non-JPEG sample) stays coded-units-only
    mixed = _tiny_mp4([jpegs[0], b"h264-coded-unit"], [[0, 1]], [(1, 2)])
    media2 = spark.createDataFrame(
        [(6, bytearray(mixed), "video/mp4", len(mixed))],
        schema=M.MEDIA_SCHEMA,
    )
    assert all(not r.decoded for r in M.sample_frames(media2).collect())


def test_mp4_hostile_counts_clamped():
    """Crafted tiny payloads claiming ~2^32 samples/entries parse to
    None (the opaque fallback), never attempt the allocation (round-8
    advice: one hostile crawled payload would have MemoryError'd the
    whole executor batch)."""
    import struct as _s

    samples = [b"frameAA", b"frB"]
    base = _tiny_mp4(samples, chunks=[[0, 1]], stsc_runs=[(1, 2)])

    def patch(buf: bytes, marker: bytes, off: int, val: int) -> bytes:
        i = buf.index(marker)
        return buf[: i + off] + _s.pack(">I", val) + buf[i + off + 4 :]

    # stsz const-size path: n_samples drives [const] * n allocation
    hostile = patch(patch(base, b"stsz", 8, 16), b"stsz", 12, 0xFFFF_FFF0)
    assert M.parse_mp4_samples(hostile) is None
    # stsz per-sample path: count past the box extent
    assert M.parse_mp4_samples(patch(base, b"stsz", 12, 0xFFFF_FFF0)) is None
    # stco chunk count / stsc run count / stts entry count
    assert M.parse_mp4_samples(patch(base, b"stco", 8, 0xFFFF_FFF0)) is None
    assert M.parse_mp4_samples(patch(base, b"stsc", 8, 0xFFFF_FFF0)) is None
    assert M.parse_mp4_samples(patch(base, b"stts", 8, 0xFFFF_FFF0)) is None
    # stts PER-ENTRY count is clamped to n_samples, not fatal: the
    # table is still served, durations bounded
    info = M.parse_mp4_samples(patch(base, b"stts", 12, 0xFFFF_FFF0))
    assert info is not None and len(info["durations"]) == 2
    # stss sync count past its box extent
    base_sync = _tiny_mp4(
        samples, chunks=[[0, 1]], stsc_runs=[(1, 2)], sync=[1]
    )
    assert M.parse_mp4_samples(patch(base_sync, b"stss", 8, 0xFFFF_FFF0)) is None
    # the untouched fixture still parses fully after all that
    ok = M.parse_mp4_samples(base)
    assert ok is not None and ok["n_samples"] == 2


def test_null_and_corrupt_payloads_survive_every_stage(spark):
    """r13 corrupt-input battery regression: a NULL payload (a failed
    upstream fetch writes NULL) killed the whole Arrow batch with
    TypeError(bytes(None)) in all three mapInPandas stages. Contract
    now: NULL rows survive every stage NULL-preserved and flagged;
    corrupt payloads (truncated headers/bodies, garbage after a valid
    magic, random bytes) quarantine per-row via the fake-feature /
    passthrough fallbacks, never via task death."""
    import random

    import numpy as np
    from pyspark.sql import functions as F

    rng = random.Random(0)
    valid = M.encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    rows = [
        (1, b""), (2, b"BM"), (3, valid[:20]), (4, valid[:-5]),
        (5, b"\x89PNG\r\n\x1a\n" + bytes(rng.randrange(256) for _ in range(64))),
        (6, b"RIFF\x00\x00\x00\x00WAVE" + bytes(20)),
        (7, bytes(rng.randrange(256) for _ in range(256))),
        (8, valid), (9, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id", "payload",
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length("payload").cast("long").alias("byte_len"),
    )

    feats = {r.media_id: r for r in M.extract_features(media).collect()}
    assert len(feats) == 9
    assert feats[9].feature is None and feats[9].digest is None
    assert all(feats[i].feature is not None for i in range(1, 9))

    res = {r.media_id: r for r in M.resize_images(media, 2, 2).collect()}
    assert len(res) == 9
    assert res[8].resized and res[8].payload is not None
    assert res[9].payload is None and not res[9].resized
    assert all(not res[i].resized and res[i].payload is not None for i in range(1, 8))

    fr = {r.media_id: r for r in M.sample_frames(media).collect()}
    assert len(fr) == 9
    assert fr[9].payload is None and fr[9].n_frames == 0 and not fr[9].decoded
