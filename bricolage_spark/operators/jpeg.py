"""Baseline + progressive JPEG (JFIF) decoder — pure stdlib + numpy.

Implements the ITU-T T.81 baseline sequential DCT process (SOF0):
marker/segment parse (DQT/DHT/SOF/DRI/SOS), canonical Huffman entropy
decode with byte unstuffing and restart-marker resync, dequantize +
dezigzag, 8×8 inverse DCT as two dense matmuls (numpy), chroma
upsampling by sampling factor, and YCbCr→RGB conversion — and, since
round 9, the PROGRESSIVE DCT process (SOF2, annex G): spectral-selection
bands and successive-approximation bit-planes accumulate across scans in
per-component coefficient grids (DC first/refine, AC first/refine with
EOB-run decoding and correction bits), rendered once at EOI with a
vectorized whole-grid IDCT. Arithmetic coding, 12-bit precision,
hierarchical and lossless modes raise ``ValueError`` so the multimodal
dispatch (operators/multimodal.py) falls back to the labeled digest
stand-in instead of crashing a batch.

Runs inside Arrow ``mapInPandas`` worker batches (never on the driver);
the entropy decode is a per-bit Python loop — fine for feature
extraction over test assets, and the seam where a vectorized/NVJPEG
implementation would slot in on a real cluster.

Reference parity note: the reference engine shells out to system codec
libraries for media decode; this module exists so the Spark pipeline has
at least one REAL lossy-image path end-to-end in a container with no
PIL/ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[i] = raster index of the i-th zigzagged coef
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal DCT-II basis; inverse DCT is T.T @ block @ T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _T[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _T.T @ block @ _T


class _HuffTable:
    """Canonical Huffman table from a DHT segment (16 counts + symbols)."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, si = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[si]
                code += 1
                si += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker detection."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None  # pending RST/EOI marker code

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # past a marker: feed zero bits (T.81 F.2.2.5 padding)
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                else:  # a real marker terminates the entropy segment
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def decode_huffman(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume the pending RSTn marker."""
        self.nbits = 0
        self.bitbuf = 0
        if self.marker is None:
            raise ValueError("expected JPEG restart marker")
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"unexpected marker 0xFF{self.marker:02X} in scan")
        self.pos += 2  # past FF Dn
        self.marker = None


def _extend(value: int, nbits: int) -> int:
    """T.81 F.2.2.1 sign extension of a received magnitude."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array
    (grayscale replicated to 3 channels)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    coefs = None  # per-component zigzag coefficient grids (progressive)
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / bare RST
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, off + 1).astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                counts = seg[off + 1 : off + 17]
                n = sum(counts)
                table = _HuffTable(counts, seg[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                off += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded scan follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            scan_order = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 15)
                scan_order.append(cs)
            if not progressive:
                return _decode_scan(
                    payload, pos + 2 + seglen, frame, scan_tables,
                    qt, huff_dc, huff_ac, restart_interval,
                )
            if coefs is None:
                coefs = _empty_coefs(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                payload, pos + 2 + seglen, frame, scan_order, scan_tables,
                ss, se, ahal >> 4, ahal & 15, coefs,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        elif marker == 0xD9:  # EOI
            break
        pos += 2 + seglen
    if coefs is not None:
        return _render_coefs(frame, coefs, qt)
    raise ValueError("JPEG contained no decodable scan")


def _lookup(tables, key, kind: str):
    """Dict lookup that degrades a corrupt stream to the quarantinable
    error family: a mutated DHT/DQT/SOS can reference a table id that
    was never defined, and a bare KeyError would escape the
    (ValueError, ...) quarantine in decode_media/sample_frames and kill
    the whole Arrow task on one hostile row (r13 mutation fuzz:
    10/800 mutants hit this)."""
    try:
        return tables[key]
    except KeyError:
        raise ValueError(
            f"JPEG scan references undefined {kind} {key}"
        ) from None


def _decode_scan(
    payload, start, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    if not all(cid in scan_tables for cid, *_ in comps):
        raise ValueError("non-interleaved JPEG scans unsupported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component plane buffers at that component's resolution
    planes = [
        np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for _, hs, vs, _ in comps
    ]
    reader = _BitReader(payload, start)
    pred = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    # table ids are per-scan constants: validate/resolve ONCE, not per MCU
    tables = [
        (
            _lookup(huff_dc, scan_tables[cid][0], "DC table"),
            _lookup(huff_ac, scan_tables[cid][1], "AC table"),
            _lookup(qt, tq, "quant table"),
        )
        for cid, hs, vs, tq in comps
    ]
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.sync_restart()
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            dc_t, ac_t, quant = tables[ci]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int32)
                    t = reader.decode_huffman(dc_t)
                    pred[ci] += _extend(reader.read_bits(t), t)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huffman(ac_t)
                        r, s = rs >> 4, rs & 15
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL: 16 zeros
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz * quant
                    spatial = _idct2(block.reshape(8, 8)) + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    return _planes_to_rgb(h, w, comps, planes, hmax, vmax, mcus_x, mcus_y)


def _planes_to_rgb(h, w, comps, planes, hmax, vmax, mcus_x, mcus_y) -> np.ndarray:
    """Upsample component planes to the full MCU grid, crop, and convert
    YCbCr→RGB (shared by the baseline and progressive paths)."""
    full_h, full_w = mcus_y * vmax * 8, mcus_x * hmax * 8
    up = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        up.append(plane[:full_h, :full_w])
    if len(comps) == 1:
        y = np.clip(up[0][:h, :w], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    y, cb, cr = (p[:h, :w] for p in up)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------
# T.81 annex G decoding procedures. Coefficients accumulate across scans
# in per-component zigzag grids; each scan deposits one (band, bit-depth)
# slice: DC first/refine scans may be interleaved, AC scans are
# single-component by construction (G.1.1.1.1). Rendering happens once,
# after the marker loop hits EOI — dequantize, dezigzag, IDCT (vectorized
# over all blocks), then the shared upsample/color tail.


def _frame_geometry(frame):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _empty_coefs(frame) -> list[np.ndarray]:
    """Per-component (blocks_y, blocks_x, 64) zigzag coefficient grids,
    sized to the padded (interleaved-MCU) grid."""
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    return [
        np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
        for _, hs, vs, _ in frame[2]
    ]


def _comp_block_dims(frame, ci) -> tuple[int, int]:
    """Non-interleaved block-grid dims of one component: ceil of the
    component-resolution image over 8x8 blocks (T.81 A.2.2) — smaller
    than the padded MCU grid whenever dimensions aren't MCU-aligned."""
    h, w, comps = frame
    _, hs, vs, _ = comps[ci]
    hmax, vmax, _, _ = _frame_geometry(frame)
    ch = -(-(h * vs) // vmax)
    cw = -(-(w * hs) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _next_marker(payload: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips stuffed
    0xFF00, fill 0xFFs, and stray RSTn left after the last restart row)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("JPEG scan ran past end of payload")


def _decode_prog_scan(
    payload, start, frame, scan_order, scan_tables,
    ss, se, ah, al, coefs, huff_dc, huff_ac, restart_interval,
) -> int:
    """Decode one progressive scan into ``coefs``; returns the payload
    position of the marker that follows the entropy-coded data."""
    h, w, comps = frame
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    comp_idx = {cid: i for i, (cid, *_rest) in enumerate(comps)}
    scan_cis = [_lookup(comp_idx, cs, "frame component") for cs in scan_order]
    if ss == 0 and se != 0:
        raise ValueError("JPEG scan mixes DC and AC bands")
    if ss > 0 and len(scan_cis) != 1:
        raise ValueError("progressive AC scans must be single-component")

    # T.81 A.2: a multi-component scan is MCU-interleaved; a single-
    # component scan walks that component's own block raster
    interleaved = len(scan_cis) > 1
    reader = _BitReader(payload, start)
    pred = {ci: 0 for ci in scan_cis}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def dc_block(ci, zz):
        nonlocal pred
        if ah == 0:
            t = reader.decode_huffman(
                _lookup(huff_dc, _lookup(scan_tables, comps[ci][0], "scan component")[0], "DC table")
            )
            pred[ci] += _extend(reader.read_bits(t), t)
            zz[0] = pred[ci] << al
        elif reader.read_bits(1):
            zz[0] |= p1

    def ac_first(ci, zz):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        ac_t = _lookup(huff_ac, _lookup(scan_tables, comps[ci][0], "scan component")[1], "AC table")
        k = ss
        while k <= se:
            rs = reader.decode_huffman(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient overflow")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def ac_refine(ci, zz):
        # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: newly-nonzero
        # coefficients arrive as run+sign, already-nonzero ones receive
        # one correction bit each as the scan passes over them
        nonlocal eobrun
        ac_t = _lookup(huff_ac, _lookup(scan_tables, comps[ci][0], "scan component")[1], "AC table")
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode_huffman(ac_t)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # ZRL: advance past 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("invalid AC refinement magnitude")
                    val = p1 if reader.read_bits(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bits(1) and not (int(zz[k]) & p1):
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bits(1) and not (int(zz[k]) & p1):
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1

    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        bh, bw = _comp_block_dims(frame, scan_cis[0])
        n_units = bh * bw

    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.sync_restart()
            pred = {ci: 0 for ci in scan_cis}
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for ci in scan_cis:
                _, hs, vs, _ = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = coefs[ci][my * vs + by, mx * hs + bx]
                        dc_block(ci, zz)
        else:
            ci = scan_cis[0]
            zz = coefs[ci][unit // bw, unit % bw]
            if ss == 0:
                dc_block(ci, zz)
            elif ah == 0:
                ac_first(ci, zz)
            else:
                ac_refine(ci, zz)
    return _next_marker(payload, reader.pos)


def _render_coefs(frame, coefs, qt) -> np.ndarray:
    """Dequantize + dezigzag + IDCT every accumulated block (vectorized
    over the whole grid), then the shared upsample/color tail."""
    h, w, comps = frame
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    planes = []
    for (cid, hs, vs, tq), grid in zip(comps, coefs):
        deq = grid.astype(np.float64) * _lookup(qt, tq, "quant table")[None, None, :]
        raster = np.zeros_like(deq)
        raster[:, :, ZIGZAG] = deq
        by, bx = grid.shape[:2]
        blocks = raster.reshape(by, bx, 8, 8)
        spatial = np.einsum("ij,abjk,kl->abil", _T.T, blocks, _T) + 128.0
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _planes_to_rgb(h, w, comps, planes, hmax, vmax, mcus_x, mcus_y)


def decode_jpeg(payload: bytes) -> list[float]:
    """Feature wrapper: baseline JPEG → [kind=4, width, height, n_pixels,
    mean_r, mean_g, mean_b, 0.0] (alpha slot 0 — JPEG has no alpha)."""
    img = decode_jpeg_pixels(payload)
    h, w, _ = img.shape
    means = img.astype(np.float64).mean(axis=(0, 1))
    return [
        4.0, float(w), float(h), float(w * h),
        float(means[0]), float(means[1]), float(means[2]), 0.0,
    ]
