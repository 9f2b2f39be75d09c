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

Scope of that contract: it rides the EXACT-INTEGER DC path only.  AC
coefficients are quantized from a float DCT, whose last-ulp values —
and therefore the rare exact-.5 ties the half-away rule then breaks —
depend on float summation order (einsum vs matmul vs BLAS build all
differ; libjpeg's integer DCTs differ by far more).  Non-constant
frames may thus re-encode to different BYTES across numpy/BLAS
versions while staying pixel-equivalent within the usual IDCT
tolerance; nothing in the repo hashes non-constant JPEG bytes, and
nothing should.

Complexity note: entropy coding is table-driven, not bit-serial.
Decode pre-splits restart segments and unstuffs them vectorized, then
spends ONE 16-bit-lookahead LUT probe per Huffman symbol over a
pre-unpacked word array; encode generates every (symbol, value-bits)
entry with numpy (DC diffs, AC run lengths, ZRL/EOB placement) and
bit-packs them in ≤ 27 vectorized scatter passes.  The transform
stages are broadcasted 8×8 matmuls across all blocks.  Measured on a
noisy 640×480 RGB camera frame (quality 75, 4:2:0): ~90 ms decode /
~63 ms encode per frame single-threaded — inside the reference
pipeline's 100-200 ms/frame end-to-end budget
(``projects/fire_segmentation/README.md`` §Performance Metrics), and
each Spark partition decodes its own frames in parallel.
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


_LUT_CACHE: dict[tuple, list] = {}


def _lut16(bits, huffval):
    """65536-entry lookup table: 16-bit lookahead → packed
    ``(symbol << 5) | code_length``.  Entry 0 (length 0) marks an
    invalid prefix.  This is the table-driven decode path: ONE list
    index per Huffman symbol instead of a bit-serial tree walk —
    the classic full-lookahead decoder (T.81 codes are ≤ 16 bits,
    so the table is exhaustive, never a second probe).  Memoized by
    table spec: building + listifying 65536 entries costs ~300 µs,
    which would dominate thumbnail-sized decodes, and real streams
    reuse the same handful of tables."""
    key = (tuple(bits), tuple(huffval))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(65536, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (huffval[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    if len(_LUT_CACHE) >= 16:  # bound worker memory on hostile inputs —
        # FIFO-evict one entry; clearing wholesale would also drop the
        # hot standard tables and reintroduce the rebuild cost
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    out = lut.tolist()
    _LUT_CACHE[key] = out
    return out


def _entropy_segments(data: bytes, pos: int):
    """Split the entropy-coded stream starting at byte ``pos`` into
    restart segments, with 0xFF00 unstuffing done VECTORIZED (one
    numpy pass over the bytes instead of a per-byte Python branch).
    Returns ``(segments, end_pos)`` — each segment an unstuffed uint8
    array, ``end_pos`` the offset of the 0xFF opening the first
    non-RST marker (``len(data)`` if the stream just ends).  Runs of
    0xFF fill bytes before a marker (T.81 B.1.1.2: 0xFF 0xFF is
    padding, the marker byte is the first non-0xFF) are legal in
    conformant streams — they classify as fill, not as a terminator,
    and are trimmed from the segment data (an encoder always stuffs a
    DATA 0xFF as 0xFF00, so an unpaired 0xFF here can only be
    padding)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    ffs = np.nonzero(arr[pos : n - 1] == 0xFF)[0] + pos
    nxt = arr[ffs + 1] if len(ffs) else np.empty(0, np.uint8)
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    is_fill = nxt == 0xFF
    term = np.nonzero(~(is_stuff | is_rst | is_fill))[0]
    if len(term):
        t = int(term[0])
        end_pos = int(ffs[t])
        ffs, is_stuff, is_rst, is_fill = (
            ffs[:t], is_stuff[:t], is_rst[:t], is_fill[:t]
        )
    else:
        end_pos = n
    stuff_pos = ffs[is_stuff]
    fill_set = set(ffs[is_fill].tolist())
    segments = []
    start = pos
    for cut in ffs[is_rst].tolist() + [end_pos]:
        data_end = cut
        while data_end - 1 in fill_set:  # trim the fill run pre-marker
            data_end -= 1
        seg = arr[start:data_end]
        # drop the 0x00 of each stuffed 0xFF00 pair inside this range
        sp = (
            stuff_pos[(stuff_pos >= start) & (stuff_pos < data_end)]
            - start + 1
        )
        if len(sp):
            seg = np.delete(seg, sp)
        segments.append(seg)
        start = cut + 2  # skip the RSTn marker itself
    return segments, end_pos


def _words16(seg: np.ndarray):
    """Pre-unpacked bit array in 32-bit-window form: ``words[i]`` holds
    bits ``[8i, 8i+32)`` of the zero-padded segment, so the 16-bit
    lookahead at bit position ``p`` is
    ``(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF`` — O(1) per peek.
    Returned as a Python list (scalar list indexing beats numpy scalar
    indexing in the symbol loop) plus the real bit count."""
    b = np.concatenate([seg, np.zeros(5, np.uint8)]).astype(np.uint32)
    words = (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
    return words.tolist(), 8 * len(seg)


_LUT_NP_CACHE: dict[tuple, np.ndarray] = {}


def _lut16_np(bits, huffval):
    """int32 numpy view of :func:`_lut16` for the native decoder,
    memoized under the same bounded-FIFO policy."""
    key = (tuple(bits), tuple(huffval))
    hit = _LUT_NP_CACHE.get(key)
    if hit is None:
        hit = np.asarray(_lut16(bits, huffval), dtype=np.int32)
        if len(_LUT_NP_CACHE) >= 16:
            _LUT_NP_CACHE.pop(next(iter(_LUT_NP_CACHE)))
        _LUT_NP_CACHE[key] = hit
    return hit


def _baseline_order_arrays(
    comps, scan, by_id, slot, mcus_x, mcus_y, huff_dc, huff_ac
):
    """Flat decode-order arrays for the native baseline loop: one
    coefficient ARENA holding every component's MCU-padded store
    back-to-back (per-component views returned as ``flats``), plus
    per-block (dc-LUT index, ac-LUT index, component slot, arena base
    offset) in raster MCU order — byte-for-byte the order the Python
    reference loop visits. Built with numpy broadcasting, not a
    per-block Python loop."""
    offs = {}
    total = 0
    for cid, ch, cv, _tq in comps:
        offs[cid] = total
        total += mcus_y * cv * mcus_x * ch * 64
    arena = np.zeros(total, dtype=np.int64)
    flats = {
        cid: arena[offs[cid] : offs[cid] + mcus_y * cv * mcus_x * ch * 64]
        for cid, ch, cv, _tq in comps
    }
    lut_keys: list[tuple] = []
    lut_arrs: list[np.ndarray] = []

    def lut_idx(spec):
        key = (tuple(spec[0]), tuple(spec[1]))
        if key not in lut_keys:
            lut_keys.append(key)
            lut_arrs.append(_lut16_np(*spec))
        return lut_keys.index(key)

    grids, dc_pat, ac_pat, comp_pat = [], [], [], []
    for cs, td, ta in scan:
        _cid, ch, cv, _tq = by_id[cs]
        ccols = mcus_x * ch
        rows = (
            np.arange(mcus_y, dtype=np.int64)[:, None, None, None] * cv
            + np.arange(cv, dtype=np.int64)[None, None, :, None]
        )
        cols = (
            np.arange(mcus_x, dtype=np.int64)[None, :, None, None] * ch
            + np.arange(ch, dtype=np.int64)[None, None, None, :]
        )
        grids.append(
            (((rows * ccols + cols) << 6) + offs[cs]).reshape(
                mcus_y, mcus_x, cv * ch
            )
        )
        dc_pat.append(np.full(cv * ch, lut_idx(huff_dc[td]), np.uint8))
        ac_pat.append(np.full(cv * ch, lut_idx(huff_ac[ta]), np.uint8))
        comp_pat.append(np.full(cv * ch, slot[cs], np.uint8))
    base = np.ascontiguousarray(np.concatenate(grids, axis=2).reshape(-1))
    n_mcus = mcus_x * mcus_y
    dc_id = np.tile(np.concatenate(dc_pat), n_mcus)
    ac_id = np.tile(np.concatenate(ac_pat), n_mcus)
    comp_id = np.tile(np.concatenate(comp_pat), n_mcus)
    luts_arr = np.ascontiguousarray(np.concatenate(lut_arrs))
    return arena, flats, base, dc_id, ac_id, comp_id, luts_arr


# --- decoder ------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive (SOF2) JPEG → uint8 array (h, w) for
    grayscale or (h, w, 3) RGB.  Raises JpegFormatError on arithmetic-
    coded, lossless or hierarchical streams and on malformed/truncated
    data."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:
        raise JpegFormatError(f"truncated or malformed JPEG: {exc}") from exc


_SOF_REJECT = {
    0xC3: "lossless sequential",
    0xC5: "hierarchical (differential sequential)",
    0xC6: "hierarchical (differential progressive)",
    0xC7: "hierarchical (differential lossless)",
    0xC9: "arithmetic-coded sequential",
    0xCA: "arithmetic-coded progressive",
    0xCB: "arithmetic-coded lossless",
    0xCD: "arithmetic-coded differential sequential",
    0xCE: "arithmetic-coded differential progressive",
    0xCF: "arithmetic-coded differential lossless",
}


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    progressive = False
    flats = None  # progressive: persistent per-component coefficients
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
                (huff_dc if cls == 0 else huff_ac)[tid] = (bits, huffval)
                s += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise JpegFormatError("only 8-bit precision supported")
            if h < 1 or w < 1:
                raise JpegFormatError("invalid zero dimension in SOF")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in _SOF_REJECT:
            raise JpegFormatError(
                f"{_SOF_REJECT[marker]} JPEG is not supported "
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
            o = 1 + 2 * ns
            ss, se, a = seg[o], seg[o + 1], seg[o + 2]
            band = (ss, se, a >> 4, a & 0xF)
            if not progressive:
                return _decode_scan(
                    data, pos + 2 + seg_len, frame, scan, qt,
                    huff_dc, huff_ac, restart_interval,
                )
            if flats is None:
                hh, ww, cc = frame
                hmax = max(c[1] for c in cc)
                vmax = max(c[2] for c in cc)
                mx_ = -(-ww // (8 * hmax))
                my_ = -(-hh // (8 * vmax))
                flats = {
                    cid: np.zeros(my_ * cv * mx_ * ch * 64, dtype=np.int64)
                    for cid, ch, cv, _tq in cc
                }
            pos = _decode_progressive_scan(
                data, pos + 2 + seg_len, frame, scan, band,
                huff_dc, huff_ac, restart_interval, flats,
            )
            continue
        pos += 2 + seg_len
    if progressive and flats is not None:
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        coefs = {
            cid: flats[cid].reshape(mcus_y * cv, mcus_x * ch, 64)
            for cid, ch, cv, _tq in comps
        }
        return _reconstruct(h, w, comps, coefs, qt)
    raise JpegFormatError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    """Baseline interleaved scan.  Entropy decode is table-driven: the
    restart segments are pre-split and unstuffed vectorized, the bit
    stream is pre-unpacked into 32-bit windows, and each symbol costs
    one 16-bit peek + one LUT index (``_lut16``) — no per-bit Python
    work.  The transform tail stays fully vectorized across blocks."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    slot = {c[0]: i for i, c in enumerate(comps)}
    ncomp = len(comps)

    for cs, td, ta in scan:
        if cs not in by_id or td not in huff_dc or ta not in huff_ac:
            raise JpegFormatError("scan references undefined component/table")
    dluts = {td: _lut16(*huff_dc[td]) for td in {s[1] for s in scan}}
    aluts = {ta: _lut16(*huff_ac[ta]) for ta in {s[2] for s in scan}}

    bpm = sum(by_id[cs][1] * by_id[cs][2] for cs, _, _ in scan)
    total_mcus = mcus_x * mcus_y
    per_seg = dri if dri else total_mcus

    segments, _end = _entropy_segments(data, pos)
    if len(segments) != -(-total_mcus // per_seg):
        raise JpegFormatError(
            f"restart segmentation mismatch: {len(segments)} segments "
            f"for {total_mcus} MCUs at interval {dri}"
        )

    # ---- compiled fast path (round 12) --------------------------------
    # Identical table-driven loop, identical error semantics, run in C
    # over one flat coefficient arena — the Python loop below stays as
    # the reference implementation and automatic fallback (equivalence
    # pinned by test_native_entropy_decoder_matches_python).
    from big_data_exercise_spark.multimodal import _native

    lib = _native.get_lib()
    if lib is not None:
        arena, flats, base, dc_id, ac_id, comp_id, luts_arr = (
            _baseline_order_arrays(
                comps, scan, by_id, slot, mcus_x, mcus_y, huff_dc, huff_ac
            )
        )
        import ctypes

        pred = np.zeros(ncomp, dtype=np.int64)
        oi = 0
        for si, seg in enumerate(segments):
            n_mcus = min(per_seg, total_mcus - si * per_seg)
            nblocks = n_mcus * bpm
            padded = np.concatenate([seg, np.zeros(5, np.uint8)])
            pred[:] = 0  # predictor resets at every restart marker
            rc = lib.decode_baseline(
                _native.as_ptr(padded, ctypes.c_uint8),
                8 * len(seg),
                _native.as_ptr(luts_arr, ctypes.c_int32),
                _native.as_ptr(dc_id[oi : oi + nblocks], ctypes.c_uint8),
                _native.as_ptr(ac_id[oi : oi + nblocks], ctypes.c_uint8),
                _native.as_ptr(comp_id[oi : oi + nblocks], ctypes.c_uint8),
                _native.as_ptr(base[oi : oi + nblocks], ctypes.c_int64),
                nblocks,
                _native.as_ptr(arena, ctypes.c_int64),
                _native.as_ptr(pred, ctypes.c_int64),
            )
            if rc:
                raise JpegFormatError(_native.ERRORS[rc])
            oi += nblocks
        coefs = {
            cid: flats[cid].reshape(mcus_y * cv, mcus_x * ch, 64)
            for cid, ch, cv, _tq in comps
        }
        return _reconstruct(h, w, comps, coefs, qt)

    # per-component quantized coefficient store (flat, MCU-padded dims)
    flats = {
        cid: np.zeros(mcus_y * cv * mcus_x * ch * 64, dtype=np.int64)
        for cid, ch, cv, _tq in comps
    }

    # static decode order: one (dc_lut, ac_lut, comp_slot, flat, base)
    # entry per block of every MCU, raster MCU order
    order = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cs, td, ta in scan:
                _cid, ch, cv, _tq = by_id[cs]
                ccols = mcus_x * ch
                dl, al, ci, flat = dluts[td], aluts[ta], slot[cs], flats[cs]
                for v_ in range(cv):
                    row = my * cv + v_
                    for h_ in range(ch):
                        order.append(
                            (dl, al, ci, flat, (row * ccols + mx * ch + h_) << 6)
                        )

    oi = 0
    for si, seg in enumerate(segments):
        words, nbits = _words16(seg)
        pred = [0] * ncomp
        bp = 0
        n_mcus = min(per_seg, total_mcus - si * per_seg)
        for dl, al, ci, flat, base in order[oi : oi + n_mcus * bpm]:
            # DC: one LUT probe, then the signed-diff EXTEND inline
            if bp >= nbits:
                raise JpegFormatError("truncated entropy data")
            e = dl[(words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF]
            ln = e & 31
            if not ln:
                raise JpegFormatError("invalid Huffman code")
            bp += ln
            t = e >> 5
            if t:
                if t > 11:
                    raise JpegFormatError("invalid DC category")
                v = ((words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF) >> (16 - t)
                bp += t
                if v < (1 << (t - 1)):
                    v += 1 - (1 << t)
                p = pred[ci] + v
                pred[ci] = p
            else:
                p = pred[ci]
            flat[base] = p
            # AC run-length loop, same one-probe-per-symbol shape
            k = 1
            while k < 64:
                if bp >= nbits:
                    raise JpegFormatError("truncated entropy data")
                e = al[(words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF]
                ln = e & 31
                if not ln:
                    raise JpegFormatError("invalid Huffman code")
                bp += ln
                rs = e >> 5
                s_ = rs & 15
                if s_:
                    k += rs >> 4
                    if k > 63:
                        raise JpegFormatError("AC index overflow")
                    v = ((words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF) >> (16 - s_)
                    bp += s_
                    if v < (1 << (s_ - 1)):
                        v += 1 - (1 << s_)
                    flat[base + k] = v
                    k += 1
                elif rs == 0xF0:  # ZRL
                    k += 16
                else:  # EOB
                    break
        if bp > nbits:
            # a symbol's code or value bits ran into the zero padding
            # past the real data — the symbol-START guard can't catch
            # an overrun inside the segment's final block, so account
            # for consumed bits here (the old bit-serial reader raised
            # at this point; the table-driven path must too)
            raise JpegFormatError("truncated entropy data")
        oi += n_mcus * bpm

    coefs = {
        cid: flats[cid].reshape(mcus_y * cv, mcus_x * ch, 64)
        for cid, ch, cv, _tq in comps
    }
    return _reconstruct(h, w, comps, coefs, qt)


def _reconstruct(h, w, comps, coefs, qt):
    """Dequantize → de-zigzag → batched IDCT → level shift → chroma
    upsample → color transform: the fully-vectorized tail shared by
    the baseline and progressive decoders."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, ch, cv, tq in comps:
        if tq not in qt:
            raise JpegFormatError(f"undefined quantization table {tq}")
        c = coefs[cid] * qt[tq][None, None, :]
        c = c[:, :, UNZIGZAG].reshape(c.shape[0], c.shape[1], 8, 8)
        # IDCT: C.T @ S @ C across all blocks at once — broadcasted
        # matmul hits the BLAS kernel (einsum's generic contraction
        # was the profile's top cost at camera frame sizes)
        px = _C.T @ c.astype(np.float64) @ _C
        np.rint(px, out=px)  # in-place: same values, no extra pass
        px += 128
        plane = px.transpose(0, 2, 1, 3).reshape(c.shape[0] * 8, c.shape[1] * 8)
        # upsample to full resolution (sample replication), then crop;
        # a factor-1 repeat is a full-plane copy — skip it
        fv, fh = vmax // cv, hmax // ch
        if fv > 1 or fh > 1:
            plane = np.repeat(np.repeat(plane, fv, axis=0), fh, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(planes[comps[0][0]], 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise JpegFormatError(f"unsupported component count {len(comps)}")
    # fused per-channel color transform: identical float64 expressions
    # and the same rint→clip→uint8 rounding as the stacked form, minus
    # the (h, w, 3) float64 stack and its two extra full passes
    y, cb, cr = (planes[c[0]] for c in comps)
    cb = cb - 128
    cr = cr - 128
    out = np.empty((*y.shape, 3), dtype=np.uint8)
    for i, chan in enumerate(
        (y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb)
    ):
        np.rint(chan, out=chan)
        np.clip(chan, 0, 255, out=chan)
        out[..., i] = chan
    return out


def _decode_progressive_scan(
    data, pos, frame, scan, band, huff_dc, huff_ac, dri, flats
):
    """One progressive (SOF2) scan — ITU-T T.81 §G.2: spectral
    selection (separate DC/AC bands, AC scans single-component and
    non-interleaved over the component's OWN block grid) and
    successive approximation (Ah/Al bit-plane refinement with EOB-run
    coding).  Coefficients accumulate into ``flats`` across scans; the
    caller reconstructs at EOI.  Returns the byte offset of the marker
    ending this scan's entropy data.

    Uses the same table-driven entropy path as baseline: restart
    segments pre-split and unstuffed vectorized, 32-bit word windows,
    one 16-bit LUT probe per Huffman symbol."""
    ss, se, ah, al = band
    h, w, comps = frame
    by_id = {c[0]: c for c in comps}
    slot = {c[0]: i for i, c in enumerate(comps)}
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if ss > se or se > 63:
        raise JpegFormatError("bad spectral band")
    if ss == 0 and se != 0:
        raise JpegFormatError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise JpegFormatError("progressive AC scan must be single-component")
    for cs, _td, _ta in scan:
        if cs not in by_id:
            raise JpegFormatError("scan references undefined component")

    dc_scan = ss == 0
    first = ah == 0

    # visit order: (ci, flat, base) per block.  Interleaved scans walk
    # the MCU grid; single-component scans walk the component's REAL
    # block grid (T.81 A.2.2 — smaller than the MCU-padded store).
    # Single-component AC scans additionally get their base offsets as
    # a numpy array — the native fast path (round 12) consumes those
    # directly and skips the tuple list.
    from big_data_exercise_spark.multimodal import _native

    lib = _native.get_lib()
    order = []
    base_np = None
    if len(scan) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cs, _td, _ta in scan:
                    _cid, ch, cv, _tq = by_id[cs]
                    ccols = mcus_x * ch
                    flat, ci = flats[cs], slot[cs]
                    for v_ in range(cv):
                        row = my * cv + v_
                        for h_ in range(ch):
                            order.append(
                                (ci, flat, (row * ccols + mx * ch + h_) << 6)
                            )
        bpm = sum(by_id[cs][1] * by_id[cs][2] for cs, _, _ in scan)
        units_total = mcus_x * mcus_y
    else:
        cs, _td, _ta = scan[0]
        _cid, ch, cv, _tq = by_id[cs]
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        nbx, nby = -(-cw // 8), -(-chh // 8)
        ccols = mcus_x * ch
        flat, ci = flats[cs], slot[cs]
        base_np = (
            (
                np.arange(nby, dtype=np.int64)[:, None] * ccols
                + np.arange(nbx, dtype=np.int64)[None, :]
            )
            << 6
        ).ravel()
        if lib is None or dc_scan:
            for b in base_np.tolist():
                order.append((ci, flat, b))
        bpm = 1
        units_total = nbx * nby

    if dc_scan and first:
        try:
            dluts = {td: _lut16(*huff_dc[td]) for _cs, td, _ta in scan}
        except KeyError:
            raise JpegFormatError("missing DC Huffman table") from None
        lut_for = {slot[cs]: dluts[td] for cs, td, _ta in scan}
    elif not dc_scan:
        ta = scan[0][2]
        if ta not in huff_ac:
            raise JpegFormatError("missing AC Huffman table")
        alut = _lut16(*huff_ac[ta])

    segments, end_pos = _entropy_segments(data, pos)
    per_seg = dri if dri else units_total
    if len(segments) != -(-units_total // per_seg):
        raise JpegFormatError(
            f"restart segmentation mismatch: {len(segments)} segments "
            f"for {units_total} units at interval {dri}"
        )

    # ---- compiled fast path (round 12): single-component AC scans ----
    # (the symbol-dense progressive scans; DC scans are one probe or
    # one raw bit per block and stay in Python). Same loop, same error
    # semantics, C instead of Python — the loops below remain the
    # reference implementation and automatic fallback.
    if lib is not None and not dc_scan:
        import ctypes

        alut_np = _lut16_np(*huff_ac[ta])
        fn = lib.decode_prog_ac_first if first else lib.decode_prog_ac_refine
        eob = np.zeros(1, dtype=np.int64)
        oi = 0
        for si, seg in enumerate(segments):
            n_units = min(per_seg, units_total - si * per_seg)
            padded = np.concatenate([seg, np.zeros(5, np.uint8)])
            eob[0] = 0  # EOB runs cannot cross a restart
            rc = fn(
                _native.as_ptr(padded, ctypes.c_uint8),
                8 * len(seg),
                _native.as_ptr(alut_np, ctypes.c_int32),
                _native.as_ptr(base_np[oi : oi + n_units], ctypes.c_int64),
                n_units,
                ss,
                se,
                al,
                _native.as_ptr(flat, ctypes.c_int64),
                _native.as_ptr(eob, ctypes.c_int64),
            )
            if rc:
                raise JpegFormatError(_native.ERRORS[rc])
            oi += n_units
        return end_pos

    p1, m1 = 1 << al, -(1 << al)
    trunc = "truncated entropy data"
    oi = 0
    for si, seg in enumerate(segments):
        words, nbits = _words16(seg)
        bp = 0
        n_units = min(per_seg, units_total - si * per_seg)
        chunk = order[oi : oi + n_units * bpm]
        oi += n_units * bpm

        if dc_scan and first:
            pred = [0] * ncomp
            for ci, flat, base in chunk:
                if bp >= nbits:
                    raise JpegFormatError(trunc)
                e = lut_for[ci][(words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF]
                ln = e & 31
                if not ln:
                    raise JpegFormatError("invalid Huffman code")
                bp += ln
                t = e >> 5
                if t:
                    if t > 11:
                        raise JpegFormatError("invalid DC category")
                    v = ((words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF) >> (16 - t)
                    bp += t
                    if v < (1 << (t - 1)):
                        v += 1 - (1 << t)
                    pred[ci] += v
                flat[base] = pred[ci] << al

        elif dc_scan:  # DC refinement: one raw bit per block
            for _ci, flat, base in chunk:
                if bp >= nbits:
                    raise JpegFormatError(trunc)
                if (words[bp >> 3] >> (31 - (bp & 7))) & 1:
                    flat[base] |= p1
                bp += 1

        elif first:  # AC first pass: band coefficients + EOB runs
            eobrun = 0
            for _ci, flat, base in chunk:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    if bp >= nbits:
                        raise JpegFormatError(trunc)
                    e = alut[(words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF]
                    ln = e & 31
                    if not ln:
                        raise JpegFormatError("invalid Huffman code")
                    bp += ln
                    rs = e >> 5
                    s_ = rs & 15
                    r = rs >> 4
                    if s_:
                        k += r
                        if k > se:
                            raise JpegFormatError("AC index overflow")
                        v = ((words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF) >> (16 - s_)
                        bp += s_
                        if v < (1 << (s_ - 1)):
                            v += 1 - (1 << s_)
                        flat[base + k] = v << al
                        k += 1
                    elif r == 15:  # ZRL
                        k += 16
                    else:  # EOBn: run of (1<<r)+ext all-done blocks
                        eobrun = 1 << r
                        if r:
                            eobrun += (
                                (words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF
                            ) >> (16 - r)
                            bp += r
                        eobrun -= 1  # this block is the run's first
                        break

        else:  # AC refinement — T.81 G.2 correction-bit control flow
            eobrun = 0
            for _ci, flat, base in chunk:
                k = ss
                if not eobrun:
                    while k <= se:
                        if bp >= nbits:
                            raise JpegFormatError(trunc)
                        e = alut[(words[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF]
                        ln = e & 31
                        if not ln:
                            raise JpegFormatError("invalid Huffman code")
                        bp += ln
                        rs = e >> 5
                        s_ = rs & 15
                        r = rs >> 4
                        newval = 0
                        if s_:
                            if s_ != 1:
                                raise JpegFormatError(
                                    "bad refinement magnitude"
                                )
                            if bp >= nbits:
                                raise JpegFormatError(trunc)
                            newval = (
                                p1
                                if (words[bp >> 3] >> (31 - (bp & 7))) & 1
                                else m1
                            )
                            bp += 1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += (
                                    (words[bp >> 3] >> (16 - (bp & 7)))
                                    & 0xFFFF
                                ) >> (16 - r)
                                bp += r
                            break
                        # advance: correction bits over nonzero-history
                        # coefficients, skipping r zero-history slots
                        while k <= se:
                            c = flat[base + k]
                            if c:
                                if bp >= nbits:
                                    raise JpegFormatError(trunc)
                                if (words[bp >> 3] >> (31 - (bp & 7))) & 1:
                                    if not (c & p1):
                                        flat[base + k] = c + (
                                            p1 if c > 0 else m1
                                        )
                                bp += 1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            flat[base + k] = newval
                        k += 1
                if eobrun:
                    # EOB-run tail: correction bits only
                    while k <= se:
                        c = flat[base + k]
                        if c:
                            if bp >= nbits:
                                raise JpegFormatError(trunc)
                            if (words[bp >> 3] >> (31 - (bp & 7))) & 1:
                                if not (c & p1):
                                    flat[base + k] = c + (p1 if c > 0 else m1)
                            bp += 1
                        k += 1
                    eobrun -= 1

        if bp > nbits:
            # same final-block overrun accounting as the baseline
            # decoder: reads that consumed zero padding past the real
            # data must surface as truncation, not as wrong pixels
            raise JpegFormatError("truncated entropy data")
    return end_pos


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


_POW2 = np.left_shift(np.int64(1), np.arange(32, dtype=np.int64))


def _code_arrays(spec):
    """Symbol-indexed (code, length) arrays for vectorized gather."""
    carr = np.zeros(256, dtype=np.int64)
    larr = np.zeros(256, dtype=np.int64)
    for sym, (code, ln) in _canonical_codes(*spec).items():
        carr[sym] = code
        larr[sym] = ln
    return carr, larr


def _pack_entries(vals, lens):
    """Bit-pack (value, bit-length) entries MSB-first into stuffed
    bytes, fully vectorized: cumsum gives each entry's bit offset,
    then one scatter pass per bit position (≤ 27 — a DC or AC symbol
    plus its appended value bits), 1-fill padding, np.packbits, and
    vectorized 0xFF00 stuffing."""
    ends = np.cumsum(lens)
    total = int(ends[-1]) if len(ends) else 0
    starts = ends - lens
    pad = (-total) % 8
    bits = np.zeros(total + pad, dtype=np.uint8)
    bits[total:] = 1  # 1-fill per spec
    for j in range(int(lens.max()) if len(lens) else 0):
        m = lens > j
        bits[starts[m] + j] = (vals[m] >> (lens[m] - 1 - j)) & 1
    packed = np.packbits(bits)
    ffpos = np.nonzero(packed == 0xFF)[0]
    if len(ffpos):
        packed = np.insert(packed, ffpos + 1, 0)
    return packed.tobytes()


def _encode_entropy(blocks_by_comp, tables, dri, bpm):
    """Vectorized baseline entropy coder.  ``blocks_by_comp``: per
    component, its (n, 64) zigzagged quantized blocks ALREADY in scan
    order plus their global block sequence numbers; ``tables``: per
    component ((dc_code, dc_len), (ac_code, ac_len)) gather arrays.
    Emits all segments' bytes with RSTn markers between restart
    intervals.  Entry generation (DC diffs, AC runs, ZRL splits, EOBs)
    and bit packing are numpy passes — no per-symbol Python loop."""
    out = bytearray()
    total_blocks = sum(len(b) for b, _ in blocks_by_comp)
    seg_span = dri * bpm if dri else total_blocks  # blocks per segment
    n_segs = -(-total_blocks // seg_span) if total_blocks else 1
    for si in range(n_segs):
        lo, hi = si * seg_span, (si + 1) * seg_span
        vals_l, lens_l, keys_l = [], [], []
        for (blocks, seqs), ((dcc, dcl), (acc, acl)) in zip(
            blocks_by_comp, tables
        ):
            a = np.searchsorted(seqs, lo)
            b = np.searchsorted(seqs, hi)
            if a == b:
                continue
            blk = blocks[a:b]
            seq = seqs[a:b].astype(np.int64)
            nb = len(blk)
            # DC: within-segment diffs (predictor resets at restarts)
            diff = np.diff(blk[:, 0], prepend=np.int64(0))
            t = np.searchsorted(_POW2, np.abs(diff), side="right")
            vb = np.where(diff > 0, diff, diff + _POW2[t] - 1)
            vals_l.append((dcc[t] << t) | vb)
            lens_l.append(dcl[t] + t)
            keys_l.append(seq << 9)  # within-block key 0
            # AC: nonzero coefs with run lengths
            bi, kk = np.nonzero(blk[:, 1:])
            k = kk + 1
            v = blk[bi, k]
            first = np.ones(len(bi), dtype=bool)
            first[1:] = bi[1:] != bi[:-1]
            prevk = np.where(
                first, 0, np.concatenate([[0], k[:-1]]) if len(k) else 0
            )
            run = k - prevk - 1
            s = np.searchsorted(_POW2, np.abs(v), side="right")
            vb = np.where(v > 0, v, v + _POW2[s] - 1)
            rs = ((run & 15) << 4) | s
            vals_l.append((acc[rs] << s) | vb)
            lens_l.append(acl[rs] + s)
            keys_l.append((seq[bi] << 9) | (k << 2) | 3)
            # ZRL fills for runs > 15 (up to 3 per coefficient)
            nzrl = run >> 4
            zi = np.nonzero(nzrl)[0]
            if len(zi):
                rep = np.repeat(zi, nzrl[zi])
                j = np.concatenate(
                    [np.arange(c) for c in nzrl[zi]]
                ).astype(np.int64)
                vals_l.append(np.full(len(rep), acc[0xF0]))
                lens_l.append(np.full(len(rep), acl[0xF0]))
                keys_l.append((seq[bi[rep]] << 9) | (k[rep] << 2) | j)
            # EOB where the last nonzero AC sits before 63
            lastk = np.zeros(nb, dtype=np.int64)
            lastk[bi] = k  # row-major nonzero order → last write wins
            ei = np.nonzero(lastk < 63)[0]
            if len(ei):
                vals_l.append(np.full(len(ei), acc[0x00]))
                lens_l.append(np.full(len(ei), acl[0x00]))
                keys_l.append((seq[ei] << 9) | (64 << 2))
        vals = np.concatenate(vals_l)
        lens = np.concatenate(lens_l)
        keys = np.concatenate(keys_l)
        o = np.argsort(keys)
        if si:
            out += bytes([0xFF, 0xD0 + (si - 1) % 8])
        out += _pack_entries(vals[o], lens[o])
    return bytes(out)


def _quantize_blocks(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """blocks: (n, 8, 8) level-shifted samples → (n, 64) zigzagged
    quantized coefficients.  AC via float FDCT + half-away rounding;
    DC recomputed in EXACT integer arithmetic (DC = Σsamples / 8), so
    the constant-frame oracle formula holds bit-for-bit."""
    s = _C @ blocks.astype(np.float64) @ _C.T
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


def _prog_ac_spec():
    """AC Huffman spec for progressive scans.  The Annex K AC tables
    have no room for EOBn symbols (their code space is full save one
    slot), so progressive encoders always ship custom tables; this one
    is deliberately simple — EOB0..EOB14, ZRL and every (run, size)
    symbol as a flat 8-bit canonical code (176 codes; the all-ones
    code stays unassigned per the T.81 convention)."""
    vals = [n << 4 for n in range(15)]  # EOB0..EOB14
    vals.append(0xF0)  # ZRL
    for r in range(16):
        for s in range(1, 11):
            vals.append((r << 4) | s)
    bits = [0] * 16
    bits[7] = len(vals)  # all codes 8 bits long
    return bits, vals


_HUFF_AC_PROG = _prog_ac_spec()


def _emit_sos_header(scan_comps, ss, se, ah, al):
    sos = bytes([len(scan_comps)])
    for cid, td, ta in scan_comps:
        sos += bytes([cid, (td << 4) | ta])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos


def _encode_progressive_scans(qblocks, samp, mcus_x, mcus_y, h, w, dri=0):
    """Progressive (SOF2) scan-script emission — T.81 §G.1.2.  Scan
    shape mirrors what web encoders produce: an interleaved DC first
    pass at Al=1, per-component spectral-selection AC first passes at
    Al=1 (luma split into a 1-5 band and a 6-63 band), then the DC and
    AC bit-plane refinement scans (Ah=1→Al=0) with EOB-run coding and
    buffered correction bits.  ``dri`` > 0 inserts RSTn markers every
    that many units (MCUs in the interleaved DC scans, blocks in the
    single-component AC scans — the T.81 unit rule), with predictors,
    EOB runs and the bit buffer flushed at every restart, which is
    what exercises the decoder's progressive restart path against
    real streams.  Fixture-scale bit-serial emission; the hot
    production path is the baseline vectorized coder."""
    ncomp = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    dc_codes = [
        _canonical_codes(*(HUFF_DC_LUMA if i == 0 else HUFF_DC_CHROMA))
        for i in range(ncomp)
    ]
    # every AC scan uses the shared progressive table (id 0) — EOBn
    # symbols don't exist in the Annex K baseline tables
    prog_ac = _canonical_codes(*_HUFF_AC_PROG)
    ac_codes = [prog_ac] * ncomp

    def real_grid(i):
        sh, sv = samp[i]
        cw = -(-(w * sh) // hmax)
        chh = -(-(h * sv) // vmax)
        return -(-chh // 8), -(-cw // 8)

    def dc_blocks():  # interleaved MCU-grid DC visit order, with the
        # MCU index so callers can place restart boundaries
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = my * mcus_x + mx
                for i in range(ncomp):
                    sh, sv = samp[i]
                    for v_ in range(sv):
                        for h_ in range(sh):
                            yield (
                                mcu,
                                i,
                                int(qblocks[i][my * sv + v_, mx * sh + h_, 0]),
                            )

    out = bytearray()
    # redefine AC table 0 with the progressive spec (EOBn symbols)
    bits, vals = _HUFF_AC_PROG
    payload = bytes([0x10]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    # -- scan 1: DC first, Al=1, interleaved ---------------------------
    out += _emit_sos_header(
        [(i + 1, 0 if i == 0 else 1, 0) for i in range(ncomp)], 0, 0, 0, 1
    )
    wtr = _BitWriter()
    pred = [0] * ncomp
    last_mcu = 0
    for mcu, i, dc in dc_blocks():
        if dri and mcu != last_mcu and mcu % dri == 0:
            wtr.flush()  # byte-align, then RSTn; predictors reset
            wtr.out += bytes([0xFF, 0xD0 + (mcu // dri - 1) % 8])
            pred = [0] * ncomp
        last_mcu = mcu
        v = dc >> 1  # DC point transform: arithmetic shift (G.1.2.1)
        diff = v - pred[i]
        pred[i] = v
        t = abs(diff).bit_length()
        code, ln = dc_codes[i][t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    out += wtr.out

    # -- AC first passes, Al=1, one component per scan -----------------
    bands = [(0, 1, 5), (0, 6, 63)] + [(i, 1, 63) for i in range(1, ncomp)]
    for ci, ss, se in bands:
        out += _emit_sos_header([(ci + 1, 0, 0)], ss, se, 0, 1)
        wtr = _BitWriter()
        ac = ac_codes[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac[nb << 4]
                wtr.write(code, ln)
                if nb:
                    wtr.write(eobrun - (1 << nb), nb)
                eobrun = 0

        nby, nbx = real_grid(ci)
        blk_i = 0
        for r_ in range(nby):
            for c_ in range(nbx):
                if dri and blk_i and blk_i % dri == 0:
                    flush_eob()  # EOB runs cannot cross a restart
                    wtr.flush()
                    wtr.out += bytes([0xFF, 0xD0 + (blk_i // dri - 1) % 8])
                blk_i += 1
                blk = qblocks[ci][r_, c_]
                run = 0
                for k in range(ss, se + 1):
                    cv_ = int(blk[k])
                    t = abs(cv_) >> 1  # AC point transform: /2^Al
                    if t == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        code, ln = ac[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s_ = t.bit_length()
                    code, ln = ac[(run << 4) | s_]
                    wtr.write(code, ln)
                    sv_ = t if cv_ > 0 else -t
                    wtr.write(sv_ if sv_ > 0 else sv_ + (1 << s_) - 1, s_)
                    run = 0
                if run:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        wtr.flush()
        out += wtr.out

    # -- DC refinement: Ah=1 → Al=0, one raw bit per block -------------
    out += _emit_sos_header(
        [(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 1, 0
    )
    wtr = _BitWriter()
    last_mcu = 0
    for mcu, _i, dc in dc_blocks():
        if dri and mcu != last_mcu and mcu % dri == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + (mcu // dri - 1) % 8])
        last_mcu = mcu
        wtr.write(dc & 1, 1)
    wtr.flush()
    out += wtr.out

    # -- AC refinement scans: Ah=1 → Al=0, correction bits -------------
    for ci in range(ncomp):
        out += _emit_sos_header([(ci + 1, 0, 0)], 1, 63, 1, 0)
        wtr = _BitWriter()
        ac = ac_codes[ci]
        eobrun = 0
        bbuf: list[int] = []

        def flush_eob_r():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac[nb << 4]
                wtr.write(code, ln)
                if nb:
                    wtr.write(eobrun - (1 << nb), nb)
                for b_ in bbuf:
                    wtr.write(b_, 1)
                bbuf.clear()
                eobrun = 0

        nby, nbx = real_grid(ci)
        blk_i = 0
        for r_ in range(nby):
            for c_ in range(nbx):
                if dri and blk_i and blk_i % dri == 0:
                    flush_eob_r()  # run + buffered bits end here
                    wtr.flush()
                    wtr.out += bytes([0xFF, 0xD0 + (blk_i // dri - 1) % 8])
                blk_i += 1
                blk = qblocks[ci][r_, c_]
                absv = [abs(int(blk[k])) for k in range(1, 64)]
                eobpos = 0
                for idx, t in enumerate(absv):
                    if t == 1:
                        eobpos = idx + 1
                r = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = absv[k - 1]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eobpos:
                        flush_eob_r()
                        code, ln = ac[0xF0]
                        wtr.write(code, ln)
                        r -= 16
                        for b_ in br:
                            wtr.write(b_, 1)
                        br = []
                    if t > 1:  # history coefficient: correction bit
                        br.append(t & 1)
                        continue
                    flush_eob_r()  # newly significant at this bit plane
                    code, ln = ac[(r << 4) | 1]
                    wtr.write(code, ln)
                    wtr.write(1 if int(blk[k]) > 0 else 0, 1)
                    for b_ in br:
                        wtr.write(b_, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    bbuf.extend(br)
                    if eobrun == 0x7FFF or len(bbuf) > 930:
                        flush_eob_r()
        flush_eob_r()
        wtr.flush()
        out += wtr.out

    return bytes(out)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 50,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes.
    quality=50 uses the Annex K tables verbatim (the oracle contract);
    subsampling '4:2:0' halves the chroma planes (2×2 box average);
    restart_interval > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what camera firmware does for error resilience —
    and what keeps the decoder's restart path executed in tests).
    progressive=True emits a SOF2 stream with the web-typical scan
    script shape: successive approximation (Al=1 first passes, then
    bit-plane refinement) over spectral-selection bands — the same
    quantized coefficients, so it must decode pixel-identically to
    the baseline stream."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("color images must have 3 channels")
    if img.shape[0] < 1 or img.shape[1] < 1:
        raise ValueError("image dimensions must be positive")
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
    # SOF0 (baseline) / SOF2 (progressive)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">H", 2 + len(sof)) + sof
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
    if progressive:
        out += _encode_progressive_scans(
            qblocks, samp, mcus_x, mcus_y, h, w, restart_interval
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # scan-order block sequence per component (MCU raster, v then h
    # within the MCU), all numpy — feeds the vectorized entropy coder
    offs, off = [], 0
    for sh, sv in samp:
        offs.append(off)
        off += sh * sv
    bpm = off
    blocks_by_comp = []
    for i, (sh, sv) in enumerate(samp):
        qb = qblocks[i]
        by, bx = qb.shape[:2]
        row = np.arange(by, dtype=np.int64)[:, None]
        col = np.arange(bx, dtype=np.int64)[None, :]
        seq = (
            ((row // sv) * mcus_x + col // sh) * bpm
            + offs[i]
            + (row % sv) * sh
            + (col % sh)
        )
        o = np.argsort(seq.ravel())
        blocks_by_comp.append((qb.reshape(-1, 64)[o], seq.ravel()[o]))
    tables = [
        (
            _code_arrays(HUFF_DC_LUMA if i == 0 else HUFF_DC_CHROMA),
            _code_arrays(HUFF_AC_LUMA if i == 0 else HUFF_AC_CHROMA),
        )
        for i in range(ncomp)
    ]
    out += _encode_entropy(blocks_by_comp, tables, restart_interval, bpm)
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
