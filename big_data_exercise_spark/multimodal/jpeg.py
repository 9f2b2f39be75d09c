"""Pure numpy baseline-JPEG codec (ITU-T T.81) — the full-pixel JPEG
branch of the multimodal operators, no cv2/PIL required.

The reference's frame pipelines decode REAL camera JPEGs inside their
UDFs (``projects/vehicle_counting/scripts/vehicle_consumer.py:94-96``,
``projects/fire_segmentation/scripts/fire_consumer_streaming.py:
166-206`` — cv2.imdecode on base64 payloads); this container ships no
image libraries, so the engine carries its own spec-level baseline
implementation, the same approach ``multimodal/png.py`` takes for PNG:

* **decode**: marker parse (DQT / DHT / SOF0 / DRI / SOS), Huffman
  entropy decode with byte-stuffing and restart markers, dequantize,
  de-zigzag, 8×8 IDCT (one numpy tensordot across all blocks), level
  shift, chroma upsampling for 4:2:0 / 4:2:2, JFIF YCbCr→RGB.
  Progressive (SOF2) and arithmetic-coded streams are rejected with a
  clear error — baseline sequential is what cameras and cv2.imencode
  emit by default.
* **encode**: the fixture-and-resize path — level shift, 8×8 FDCT,
  quantization (ITU T.81 Annex K tables, libjpeg-style quality
  scaling), zigzag run-length, Annex K Huffman tables, byte stuffing.
  Grayscale or RGB, 4:4:4 or 4:2:0.

Determinism contract (what lets a DuckDB oracle hash-check a real
JPEG round-trip, mirroring png_pixel_stats): quantization rounds
HALF AWAY FROM ZERO, and the DC coefficient is quantized in exact
integer arithmetic (the DC of a block is sum(pixels−128)/8, so its
quantized value is an integer-rational round — no float in the loop).
For a constant-fill frame every AC coefficient quantizes to zero and
the decoded frame is again constant, with value

    clip(round_half_away(q_dc · round_half_away(8·(v−128) / q_dc) / 8) + 128)

— pure integer math both engines replay. At quality 50 the luminance
DC quantizer is exactly the Annex K value 16, so the formula collapses
to ``clip(2·round_half_away((v−128)/2) + 128)``.

Complexity note: entropy coding is inherently bit-serial and runs as
a Python loop per block — fine for the thumbnail/fixture sizes this
path handles (the PNG module's Paeth filter carries the same note);
the transform stages are vectorized across all blocks.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    pass


# --- constants (ITU-T T.81 Annex K — public standard tables) -----------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: C @ block @ C.T is the JPEG
# forward transform (S00 = 8·mean·… — see module docstring)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _round_half_away(numer: int, denom: int) -> int:
    """Exact integer round-half-away-from-zero of numer/denom
    (denom > 0) — the quantization rounding rule both the encoder and
    the DuckDB oracle formula share."""
    if numer >= 0:
        return (2 * numer + denom) // (2 * denom)
    return -((-2 * numer + denom) // (2 * denom))


def scaled_quant_tables(quality: int = 50) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables (public
    formula): scale = 5000/Q below 50 else 200−2Q; entries
    (q·scale+50)/100 clamped to [1, 255]. quality=50 returns the
    Annex K tables verbatim — which is what keeps the oracle's DC
    quantizer the literal constant 16."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def scl(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int64)
    return scl(QUANT_LUMA), scl(QUANT_CHROMA)


# --- Huffman machinery --------------------------------------------------


def _canonical_codes(bits, huffval):
    """(symbol → (code, length)) per the T.81 canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, huffval):
    """((length, code) → symbol) for bit-serial decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self):
        d = self.data
        if self.marker is not None:
            raise JpegFormatError("read past marker in entropy data")
        if self.pos >= len(d):
            raise JpegFormatError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                raise JpegFormatError("hit marker mid-symbol")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def peek_marker(self) -> int | None:
        """Marker at the CURRENT byte position (bit buffer ignored) —
        used between MCUs for restart handling."""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0:
            return d[self.pos + 1]
        return None

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self):
        self.n = 0
        self.acc = 0


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array (h, w) for grayscale or (h, w, 3)
    RGB.  Raises JpegFormatError on progressive/arithmetic streams or
    malformed/truncated data."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:
        raise JpegFormatError(f"truncated or malformed JPEG: {exc}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError("marker desync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0xF
                if prec == 0:
                    tbl = np.frombuffer(seg[s + 1 : s + 65], dtype=np.uint8)
                    s += 65
                else:
                    tbl = np.frombuffer(
                        seg[s + 1 : s + 129], dtype=">u2"
                    )
                    s += 129
                qt[tid] = tbl.astype(np.int64)
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                huffval = list(seg[s + 17 : s + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(
                    bits, huffval
                )
                s += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise JpegFormatError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                "only baseline sequential JPEG is supported "
                f"(SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tds >> 4, tds & 0xF))
            return _decode_scan(
                data, pos + 2 + seg_len, frame, scan, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seg_len
    raise JpegFormatError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}

    # per-component quantized coefficient store, MCU-padded dims
    coefs = {}
    for cid, ch, cv, _tq in comps:
        coefs[cid] = np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)

    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, _, _, _ in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                reader.byte_align()
                m = reader.peek_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    reader.pos += 2
                    reader.marker = None
                    pred = {cid: 0 for cid in pred}
                else:
                    raise JpegFormatError("expected restart marker")
            for cs, td, ta in scan:
                _cid, ch, cv, _tq = by_id[cs]
                for v_ in range(cv):
                    for h_ in range(ch):
                        blk = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, huff_dc[td])
                        diff = _extend(reader.read_bits(t), t)
                        pred[cs] += diff
                        blk[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ta])
                            r, s_ = rs >> 4, rs & 0xF
                            if s_ == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegFormatError("AC index overflow")
                            blk[k] = _extend(reader.read_bits(s_), s_)
                            k += 1
                        coefs[cs][my * cv + v_, mx * ch + h_] = blk
            mcu_index += 1

    # dequantize → de-zigzag → batched IDCT → level shift, per component
    planes = {}
    for cid, ch, cv, tq in comps:
        c = coefs[cid] * qt[tq][None, None, :]
        c = c[:, :, UNZIGZAG].reshape(c.shape[0], c.shape[1], 8, 8)
        # IDCT: C.T @ S @ C across all blocks at once
        px = np.einsum("ij,abjk,kl->abil", _C.T, c.astype(np.float64), _C)
        px = np.rint(px) + 128
        plane = px.transpose(0, 2, 1, 3).reshape(c.shape[0] * 8, c.shape[1] * 8)
        # upsample to full resolution (sample replication), then crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(planes[comps[0][0]], 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise JpegFormatError(f"unsupported component count {len(comps)}")
    y, cb, cr = (planes[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- encoder ------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(writer, blk_zz, pred, dc_codes, ac_codes):
    """Huffman-encode one zigzagged quantized block; returns new DC
    predictor."""
    diff = int(blk_zz[0]) - pred
    if diff == 0:
        t = 0
    else:
        t = int(abs(diff)).bit_length()
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        writer.write(v, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(blk_zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(blk_zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        bits = v if v > 0 else v + (1 << s) - 1
        writer.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(blk_zz[0])


def _quantize_blocks(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """blocks: (n, 8, 8) level-shifted samples → (n, 64) zigzagged
    quantized coefficients.  AC via float FDCT + half-away rounding;
    DC recomputed in EXACT integer arithmetic (DC = Σsamples / 8), so
    the constant-frame oracle formula holds bit-for-bit."""
    s = np.einsum("ij,ajk,kl->ail", _C, blocks.astype(np.float64), _C.T)
    qf = s / q.reshape(8, 8)[None]
    out = (np.sign(qf) * np.floor(np.abs(qf) + 0.5)).astype(np.int64)
    dc_num = blocks.reshape(len(blocks), 64).sum(axis=1)  # Σ(v−128) = 8·S00
    qdc = int(q[0])
    out[:, 0, 0] = [
        _round_half_away(int(n), 8 * qdc) for n in dc_num
    ]
    return out.reshape(len(blocks), 64)[:, ZIGZAG]


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D int plane to 8×8 multiples by edge replication and
    return (n_blocks, 8, 8) in raster MCU-free order + block grid."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def encode_jpeg(
    img: np.ndarray,
    quality: int = 50,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes.
    quality=50 uses the Annex K tables verbatim (the oracle contract);
    subsampling '4:2:0' halves the chroma planes (2×2 box average);
    restart_interval > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what camera firmware does for error resilience —
    and what keeps the decoder's restart path executed in tests)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("color images must have 3 channels")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError("subsampling must be 4:4:4, 4:2:2 or 4:2:0")
    h, w = img.shape[:2]
    ql, qc = scaled_quant_tables(quality)

    if gray:
        planes = [img.astype(np.int64) - 128]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        y, cb, cr = (
            np.clip(np.rint(p), 0, 255).astype(np.int64) for p in (y, cb, cr)
        )
        if subsampling != "4:4:4":
            # box-average downsample: 2×2 for 4:2:0, 1×2 (horizontal
            # only) for 4:2:2
            fy = 2 if subsampling == "4:2:0" else 1

            def down(p):
                hh, ww = p.shape
                pp = np.pad(
                    p, ((0, hh % fy), (0, ww % 2)), mode="edge"
                ).astype(np.float64)
                cells = pp[0::fy, 0::2] + pp[0::fy, 1::2]
                if fy == 2:
                    cells = cells + pp[1::2, 0::2] + pp[1::2, 1::2]
                return np.clip(
                    np.rint(cells / (2 * fy)), 0, 255
                ).astype(np.int64)

            cb, cr = down(cb), down(cr)
        planes = [y - 128, cb - 128, cr - 128]
        samp = {
            "4:4:4": [(1, 1), (1, 1), (1, 1)],
            "4:2:2": [(2, 1), (1, 1), (1, 1)],
            "4:2:0": [(2, 2), (1, 1), (1, 1)],
        }[subsampling]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each plane to its MCU-aligned block grid, quantize all blocks
    qblocks = []
    grids = []
    for i, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        padded = np.pad(
            p,
            ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
            mode="edge",
        )
        blocks, by, bx = _plane_blocks(padded)
        q = ql if i == 0 else qc
        qblocks.append(_quantize_blocks(blocks, q).reshape(by, bx, 64))
        grids.append((by, bx))

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0: identifier, version 1.1, unitless 1:1 aspect, no thumb
    app0 = b"JFIF\x00" + b"\x01\x01" + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT (table 0 = luma; table 1 = chroma when color)
    zz_ql = ql[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + b"\x00" + zz_ql
    if not gray:
        zz_qc = qc[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + b"\x01" + zz_qc
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    def dht(cls, tid, spec):
        bits, vals = spec
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)
    writer = _BitWriter()
    pred = [0] * ncomp
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()  # pad to byte, per spec, before RSTn
                writer.out += bytes(
                    [0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8]
                )
                pred = [0] * ncomp  # DC predictors reset at a restart
            mcu_index += 1
            for i in range(ncomp):
                sh, sv = samp[i]
                dc, ac = (dc_l, ac_l) if i == 0 else (dc_c, ac_c)
                for v_ in range(sv):
                    for h_ in range(sh):
                        blk = qblocks[i][my * sv + v_, mx * sh + h_]
                        pred[i] = _encode_block(writer, blk, pred[i], dc, ac)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def constant_roundtrip_value(v: int, q_dc: int = 16) -> int:
    """Closed-form decoded value of a constant-fill grayscale frame of
    value ``v`` encoded at a DC quantizer of ``q_dc`` — the formula
    the DuckDB oracle replays (module docstring).  Exists so tests pin
    codec-vs-formula agreement directly.

    Only valid for ``q_dc % 8 == 0``: then the dequantized DC over 8
    is an exact integer and no rounding tie can arise.  For other
    quantizers ``q_dc·sq/8`` can land on .5, where this formula rounds
    half away from zero but the decoder's float IDCT + np.rint rounds
    half to even (and the DCT matrix's last-ulp noise makes the tie
    direction unreliable anyway) — so the claim is refused rather than
    silently wrong."""
    if q_dc % 8 != 0:
        raise ValueError(
            "closed form requires a DC quantizer divisible by 8 "
            f"(got {q_dc}); quality=50's Annex K value 16 qualifies"
        )
    d = v - 128
    sq = _round_half_away(8 * d, q_dc)
    return max(0, min(255, _round_half_away(q_dc * sq, 8) + 128))
