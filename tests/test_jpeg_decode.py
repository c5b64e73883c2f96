"""Baseline JPEG decoding verified against an independent in-test
encoder: forward DCT + quantization + canonical Huffman built straight
from T.81, sharing no code with the decoder under test.  Covers 4:4:4
color, grayscale, 4:2:0 subsampling, non-multiple-of-8 dimensions,
restart intervals, and the unsupported-variant fallback contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bricolage_spark.operators import jpeg as J
from bricolage_spark.operators import multimodal as M

# encoder-side zigzag: position i of the zigzag stream takes raster ZZ[i]
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT-II, orthonormal, computed from the cosine formula
    directly (independent of the decoder's basis matrix)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.125) if u == 0 else 0.5
            cv = np.sqrt(0.125) if v == 0 else 0.5
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = cu * cv * s
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self) -> None:  # pad with 1-bits (T.81 F.1.2.3)
        while self.n:
            self.put(1, 1)


# simple canonical tables: DC sizes 0..11 all length 5; AC run/size
# bytes 0..254 at length 9 plus 0xFF at length 10 (DHT counts are single
# bytes, so one length can hold at most 255 symbols)
_DC_LEN = 5


def _ac_code(sym: int) -> tuple[int, int]:
    """Canonical code for the split AC table: 0..254 → 9-bit code=sym,
    255 → 10-bit code 0b111111111_0<<... = (255 << 1)."""
    return (sym, 9) if sym < 255 else (255 << 1, 10)


def _dht(tc: int, th: int, counts: list[int], symbols: list[int]) -> bytes:
    assert len(counts) == 16 and sum(counts) == len(symbols)
    return bytes([(tc << 4) | th] + counts + symbols)


def _size_of(v: int) -> int:
    return abs(v).bit_length()


def _mag_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg(
    rgb: np.ndarray, quant: np.ndarray | None = None, subsample: bool = False,
    grayscale: bool = False, restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JFIF encoder: 4:4:4 (or 4:2:0) YCbCr, one quant
    table, flat Huffman tables, optional restart markers."""
    h, w = rgb.shape[:2]
    quant = quant if quant is not None else np.ones(64, dtype=np.int32)
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if grayscale:
        comps = [(1, 1, 1, y)]
    elif subsample:
        # 4:2:0: chroma = 2x2 box mean; pad odd dims by edge replication
        def box2(p):
            ph = p[: h + (h & 1), : w + (w & 1)]
            if h & 1:
                ph = np.vstack([p, p[-1:]])
            if w & 1:
                ph = np.hstack([ph, ph[:, -1:]])
            return (ph[0::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0
        comps = [(1, 2, 2, y), (2, 1, 1, box2(cb)), (3, 1, 1, box2(cr))]
    else:
        comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    padded = []
    for cid, hs, vs, plane in comps:
        th_, tw_ = mcus_y * vs * 8, mcus_x * hs * 8
        ph, pw = plane.shape
        p = np.zeros((th_, tw_))
        p[:ph, :pw] = plane
        if pw < tw_:
            p[:, pw:] = p[:, pw - 1 : pw]
        if ph < th_:
            p[ph:, :] = p[ph - 1 : ph, :]
        padded.append((cid, hs, vs, p))

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    n_mcus = mcus_x * mcus_y
    rst = 0
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.align()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, hs, vs, plane in padded:
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coefs = _fdct(blk).reshape(64)
                    q = np.array(
                        [int(np.floor(coefs[ZZ[i]] / quant[i] + 0.5)) for i in range(64)]
                    )
                    diff = int(q[0]) - pred[cid]
                    pred[cid] = int(q[0])
                    s = _size_of(diff)
                    bw.put(s, _DC_LEN)  # flat DC table: code == symbol
                    bw.put(_mag_bits(diff, s), s)
                    k = 1
                    while k < 64:
                        run = 0
                        while k < 64 and q[k] == 0:
                            run += 1
                            k += 1
                        if k == 64:
                            bw.put(*_ac_code(0x00))  # EOB
                            break
                        while run > 15:
                            bw.put(*_ac_code(0xF0))  # ZRL
                            run -= 16
                        s = _size_of(int(q[k]))
                        bw.put(*_ac_code((run << 4) | s))
                        bw.put(_mag_bits(int(q[k]), s), s)
                        k += 1
    bw.align()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in quant))
    dc_counts = [0] * 16
    dc_counts[_DC_LEN - 1] = 12
    out += seg(0xC4, _dht(0, 0, dc_counts, list(range(12))))
    ac_counts = [0] * 16
    ac_counts[8], ac_counts[9] = 255, 1  # 0..254 at len 9, 0xFF at len 10
    out += seg(0xC4, _dht(1, 0, ac_counts, list(range(255)) + [255]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, _ in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _smooth_image(h: int, w: int, seed: int = 3) -> np.ndarray:
    """Low-frequency test image: quantization error stays small, so the
    decode can be compared pixel-wise with a tight tolerance."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 80 * np.sin(xx / 7.0)
    g = 128 + 80 * np.cos(yy / 9.0)
    b = 128 + 60 * np.sin((xx + yy) / 11.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_444():
    img = _smooth_image(24, 16)
    dec = J.decode_jpeg_pixels(encode_jpeg(img))
    assert dec.shape == img.shape
    # quant=1 → error is DCT rounding + two colorspace trips
    assert float(np.abs(dec.astype(int) - img.astype(int)).max()) <= 3
    feat = J.decode_jpeg(encode_jpeg(img))
    assert feat[:4] == [4.0, 16.0, 24.0, 384.0]
    means = img.astype(np.float64).mean(axis=(0, 1))
    assert feat[4] == pytest.approx(means[0], abs=1.5)
    assert feat[5] == pytest.approx(means[1], abs=1.5)
    assert feat[6] == pytest.approx(means[2], abs=1.5)


def test_jpeg_grayscale_and_odd_dims():
    img = _smooth_image(13, 10)
    gray = np.dstack([img[..., 0]] * 3)
    dec = J.decode_jpeg_pixels(encode_jpeg(gray, grayscale=True))
    assert dec.shape == (13, 10, 3)  # crop back from the 16x16 MCU grid
    y = 0.299 * gray[..., 0] + 0.587 * gray[..., 1] + 0.114 * gray[..., 2]
    assert float(np.abs(dec[..., 0].astype(float) - y).max()) <= 2.5
    assert np.array_equal(dec[..., 0], dec[..., 1])


def test_jpeg_420_subsampling():
    img = _smooth_image(32, 32, seed=5)
    dec = J.decode_jpeg_pixels(encode_jpeg(img, subsample=True))
    assert dec.shape == img.shape
    # chroma is box-averaged; on a smooth gradient the error stays small
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) <= 6
    assert float(np.abs(dec.astype(int) - img.astype(int)).max()) <= 40


def test_jpeg_restart_markers():
    img = _smooth_image(16, 40)  # 10 MCUs in a row at 4:4:4
    plain = J.decode_jpeg_pixels(encode_jpeg(img))
    with_rst = J.decode_jpeg_pixels(encode_jpeg(img, restart_interval=3))
    assert np.array_equal(plain, with_rst)


def test_jpeg_lossy_quant_table():
    img = _smooth_image(24, 24)
    quant = np.full(64, 16, dtype=np.int32)
    quant[0] = 8
    dec = J.decode_jpeg_pixels(encode_jpeg(img, quant=quant))
    # lossy but bounded: error scales with the quant step
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) <= 8


def test_jpeg_unsupported_falls_back():
    img = _smooth_image(8, 8)
    payload = bytearray(encode_jpeg(img))
    # flip SOF0 (0xC0) to SOF3 lossless (0xC3) → ValueError → fallback
    # (SOF2 progressive is DECODED since round 9, so it no longer tests
    # the unsupported-variant contract)
    idx = payload.index(bytes([0xFF, 0xC0]))
    payload[idx + 1] = 0xC3
    payload = bytes(payload)
    with pytest.raises(ValueError):
        J.decode_jpeg_pixels(payload)
    assert M.decode_media(payload) == M._fake_feature(payload)
    # dispatch: a valid JPEG decodes as kind 4 through decode_media
    assert M.decode_media(encode_jpeg(img))[0] == 4.0


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder: spectral selection + successive approximation
# ---------------------------------------------------------------------------
# Independent dual of the decoder's annex-G procedures (T.81 G.1.2):
# DC first/refine, AC first with accumulated EOB runs, AC refine with
# newly-nonzero run/sign symbols and buffered correction bits.


def _prog_planes(rgb, quant, subsample, grayscale):
    """Color-convert, pad, and quantize to per-component zigzag grids
    (same front half as encode_jpeg, returning grids instead of a scan)."""
    h, w = rgb.shape[:2]
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if grayscale:
        comps = [(1, 1, 1, y)]
    elif subsample:
        def box2(p):
            ph = p[: h + (h & 1), : w + (w & 1)]
            if h & 1:
                ph = np.vstack([p, p[-1:]])
            if w & 1:
                ph = np.hstack([ph, ph[:, -1:]])
            return (ph[0::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0
        comps = [(1, 2, 2, y), (2, 1, 1, box2(cb)), (3, 1, 1, box2(cr))]
    else:
        comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = []
    meta = []
    for cid, hs, vs, plane in comps:
        th_, tw_ = mcus_y * vs * 8, mcus_x * hs * 8
        ph, pw = plane.shape
        p = np.zeros((th_, tw_))
        p[:ph, :pw] = plane
        if pw < tw_:
            p[:, pw:] = p[:, pw - 1 : pw]
        if ph < th_:
            p[ph:, :] = p[ph - 1 : ph, :]
        by_n, bx_n = th_ // 8, tw_ // 8
        grid = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coefs = _fdct(blk).reshape(64)
                grid[by, bx] = [
                    int(np.floor(coefs[ZZ[i]] / quant[i] + 0.5)) for i in range(64)
                ]
        grids.append(grid)
        meta.append((cid, hs, vs))
    return h, w, meta, grids, hmax, vmax, mcus_x, mcus_y


class _ProgScanWriter:
    """One scan's entropy stream with EOB-run + correction-bit buffering."""

    def __init__(self):
        self.bw = _BitWriter()
        self.eobrun = 0
        self.br: list[int] = []  # correction bits pending with the EOB run

    def flush_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.bw.put(*_ac_code(r << 4))
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.br:
            self.bw.put(bit, 1)
        self.br = []

    def restart(self, rst_index):
        self.flush_eobrun()
        self.bw.align()
        self.bw.out += bytes([0xFF, 0xD0 + (rst_index % 8)])

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.bw.align()
        return bytes(self.bw.out)


def _dc_first_bits(sw, grids, order, mcus_x, mcus_y, meta, al, restart_interval):
    pred = {ci: 0 for ci in order}
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            sw.restart(rst)
            rst += 1
            pred = {ci: 0 for ci in order}
        my, mx = divmod(mcu, mcus_x)
        for ci in order:
            _, hs, vs = meta[ci]
            for by in range(vs):
                for bx in range(hs):
                    v = int(grids[ci][my * vs + by, mx * hs + bx, 0]) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = _size_of(diff)
                    sw.bw.put(s, _DC_LEN)
                    sw.bw.put(_mag_bits(diff, s), s)


def _dc_refine_bits(sw, grids, order, mcus_x, mcus_y, meta, al, restart_interval):
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            sw.restart(rst)
            rst += 1
        my, mx = divmod(mcu, mcus_x)
        for ci in order:
            _, hs, vs = meta[ci]
            for by in range(vs):
                for bx in range(hs):
                    v = int(grids[ci][my * vs + by, mx * hs + bx, 0])
                    sw.bw.put((v >> al) & 1, 1)


def _comp_blocks_dims(h, w, meta, ci, hmax, vmax):
    _, hs, vs = meta[ci]
    ch = -(-(h * vs) // vmax)
    cw = -(-(w * hs) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _ac_first_block(sw, zz, ss, se, al):
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        vals.append(-t if v < 0 else t)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            sw.bw.put(*_ac_code(0xF0))
            run -= 16
        s = _size_of(v)
        sw.bw.put(*_ac_code((run << 4) | s))
        sw.bw.put(_mag_bits(v, s), s)
        run = 0
    if last < se - ss:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _ac_refine_block(sw, zz, ss, se, al):
    absv, neg = [], []
    for k in range(ss, se + 1):
        v = int(zz[k])
        absv.append(abs(v) >> al)
        neg.append(v < 0)
    eob = -1  # index of the last NEWLY-nonzero coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    run = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            sw.flush_eobrun()
            sw.bw.put(*_ac_code(0xF0))
            for bit in br:
                sw.bw.put(bit, 1)
            br = []
            run -= 16
        if t > 1:
            br.append(t & 1)  # history coefficient: one correction bit
            continue
        sw.flush_eobrun()
        sw.bw.put(*_ac_code((run << 4) | 1))
        sw.bw.put(0 if neg[i] else 1, 1)
        for bit in br:
            sw.bw.put(bit, 1)
        br = []
        run = 0
    if run > 0 or br:
        sw.eobrun += 1
        sw.br.extend(br)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _ac_scan_bits(sw, grid, h, w, meta, ci, hmax, vmax, ss, se, al,
                  refine, restart_interval):
    bh, bw_ = _comp_blocks_dims(h, w, meta, ci, hmax, vmax)
    rst = 0
    for unit in range(bh * bw_):
        if restart_interval and unit and unit % restart_interval == 0:
            sw.restart(rst)
            rst += 1
        zz = grid[unit // bw_, unit % bw_]
        if refine:
            _ac_refine_block(sw, zz, ss, se, al)
        else:
            _ac_first_block(sw, zz, ss, se, al)


def encode_jpeg_progressive(
    rgb: np.ndarray, quant: np.ndarray | None = None, subsample: bool = False,
    grayscale: bool = False, restart_interval: int = 0,
) -> bytes:
    """Progressive JFIF encoder: the default scan script exercises every
    annex-G decode path — interleaved DC first (Al=1) and refine, split
    AC first bands at Al=2, then two AC refinement passes per component
    down to full precision (so the decoded coefficients equal the
    baseline encoder's exactly)."""
    h, w = rgb.shape[:2]
    quant = quant if quant is not None else np.ones(64, dtype=np.int32)
    h, w, meta, grids, hmax, vmax, mcus_x, mcus_y = _prog_planes(
        rgb, quant, subsample, grayscale
    )
    order = list(range(len(meta)))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_cis, ss, se, ah, al, data: bytes) -> bytes:
        body = bytes([len(comp_cis)])
        for ci in comp_cis:
            body += bytes([meta[ci][0], 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body) + data

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in quant))
    dc_counts = [0] * 16
    dc_counts[_DC_LEN - 1] = 12
    out += seg(0xC4, _dht(0, 0, dc_counts, list(range(12))))
    ac_counts = [0] * 16
    ac_counts[8], ac_counts[9] = 255, 1
    out += seg(0xC4, _dht(1, 0, ac_counts, list(range(255)) + [255]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(meta)])
    for cid, hs, vs in meta:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    # scan script: DC first Al=1 (interleaved) -> AC first bands at Al=2
    # (split band for comp 0: EOB runs + ZRL both get exercised) ->
    # AC refine Al=2->1 -> DC refine -> AC refine Al=1->0
    sw = _ProgScanWriter()
    _dc_first_bits(sw, grids, order, mcus_x, mcus_y, meta, 1, restart_interval)
    out += sos(order, 0, 0, 0, 1, sw.finish())
    for ci in order:
        bands = [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]
        for ss, se in bands:
            sw = _ProgScanWriter()
            _ac_scan_bits(sw, grids[ci], h, w, meta, ci, hmax, vmax,
                          ss, se, 2, False, restart_interval)
            out += sos([ci], ss, se, 0, 2, sw.finish())
    for al in (1, 0):
        for ci in order:
            sw = _ProgScanWriter()
            _ac_scan_bits(sw, grids[ci], h, w, meta, ci, hmax, vmax,
                          1, 63, al, True, restart_interval)
            out += sos([ci], 1, 63, al + 1, al, sw.finish())
        if al == 1:
            sw = _ProgScanWriter()
            _dc_refine_bits(sw, grids, order, mcus_x, mcus_y, meta, 0,
                            restart_interval)
            out += sos(order, 0, 0, 1, 0, sw.finish())
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_matches_baseline_444():
    """Full successive-approximation refinement reconstructs the EXACT
    quantized coefficients, so progressive and baseline decodes of the
    same image are bit-identical."""
    img = _smooth_image(24, 16)
    base = J.decode_jpeg_pixels(encode_jpeg(img))
    prog = J.decode_jpeg_pixels(encode_jpeg_progressive(img))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_odd_dims_and_grayscale():
    img = _smooth_image(13, 10)
    gray = np.dstack([img[..., 0]] * 3)
    base = J.decode_jpeg_pixels(encode_jpeg(gray, grayscale=True))
    prog = J.decode_jpeg_pixels(encode_jpeg_progressive(gray, grayscale=True))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_420_subsampling():
    """4:2:0: the interleaved DC scan walks the padded MCU grid while
    single-component AC scans walk each component's OWN block raster —
    the grid-mismatch case T.81 A.2.2 defines."""
    img = _smooth_image(24, 40, seed=5)  # w%16 = 8: luma rasters differ
    base = J.decode_jpeg_pixels(encode_jpeg(img, subsample=True))
    prog = J.decode_jpeg_pixels(encode_jpeg_progressive(img, subsample=True))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_lossy_quant_and_restart():
    img = _smooth_image(16, 40)
    quant = np.full(64, 16, dtype=np.int32)
    quant[0] = 8
    base = J.decode_jpeg_pixels(encode_jpeg(img, quant=quant))
    prog = J.decode_jpeg_pixels(encode_jpeg_progressive(img, quant=quant))
    assert np.array_equal(prog, base)
    with_rst = J.decode_jpeg_pixels(
        encode_jpeg_progressive(img, quant=quant, restart_interval=3)
    )
    assert np.array_equal(with_rst, base)


def test_jpeg_progressive_through_media_dispatch():
    img = _smooth_image(8, 8)
    feat = M.decode_media(encode_jpeg_progressive(img))
    assert feat[0] == 4.0 and feat[1:4] == [8.0, 8.0, 64.0]


def test_jpeg_mutation_fuzz_stays_in_quarantine_family():
    """r13 mutation fuzz regression: every hostile mutation of a valid
    JPEG (byte flips, truncations, slice duplication, random inserts)
    must either decode or raise inside the (ValueError, zlib.error,
    struct.error, IndexError, MemoryError) family that decode_media /
    sample_frames quarantine per-row — 10/800 mutants escaped as bare
    KeyError (scan referencing an undefined DHT/DQT table id) before
    jpeg._lookup. 200 pinned-seed mutants per mode here; the full 800
    ran clean post-fix."""
    import random
    import struct
    import zlib

    import numpy as np

    from bricolage_spark.operators.jpeg import decode_jpeg_pixels

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    pyrng = random.Random(1)
    for base in (encode_jpeg(img), encode_jpeg_progressive(img)):
        for _ in range(100):
            buf = bytearray(base)
            kind = pyrng.random()
            if kind < 0.4:
                for _ in range(pyrng.randint(1, 8)):
                    buf[pyrng.randrange(len(buf))] = pyrng.randrange(256)
            elif kind < 0.7:
                buf = buf[: pyrng.randrange(2, len(buf))]
            elif kind < 0.85:
                i = pyrng.randrange(len(buf))
                j = pyrng.randrange(i, len(buf))
                buf = buf[:j] + buf[i:j] + buf[j:]
            else:
                i = pyrng.randrange(len(buf))
                buf = (
                    buf[:i]
                    + bytes(pyrng.randrange(256) for _ in range(pyrng.randint(1, 16)))
                    + buf[i:]
                )
            try:
                decode_jpeg_pixels(bytes(buf))
            except (ValueError, zlib.error, struct.error, IndexError, MemoryError):
                pass  # the quarantinable family — per-row fallback
