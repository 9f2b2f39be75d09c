"""Real-codec lane (round-3 verdict item 4): the PNG implementation
is pinned to the SPEC, not to itself — encode with every scanline
filter must decode to the same array, corrupted bytes must fail CRC,
and the Spark operators must take the REAL branch for PNG/JPEG bytes.
A cv2/PIL cross-check lights up wherever those libraries exist."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from big_data_exercise_spark.multimodal.png import (
    PngFormatError,
    decode_png,
    encode_png,
    jpeg_meta,
    png_meta,
)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    img = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    data = encode_png(img, filter_type=filter_type)
    assert png_meta(data) == (17, 13, channels)
    out = decode_png(data)
    assert out.shape == (13, 17, channels)
    assert (out == img).all()


def test_png_crc_detects_corruption():
    img = np.zeros((5, 5, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[45] ^= 0xFF  # flip one IDAT byte
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_bad_signature_and_lying_interlace_flag():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    # IHDR payload: sig(8) + len(4) + type(4) + 13 bytes; interlace
    # flag is the last IHDR byte (offset 8+8+12=28); fixing the CRC
    # makes a well-formed header whose flag LIES about the body layout
    # (the Adam7 passes sum to a different byte count) — the decoder
    # must catch the mismatch, not mis-scatter pixels.
    import zlib

    data[28] = 1
    ihdr = bytes(data[12:16]) + bytes(data[16:29])
    data[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(PngFormatError, match="size mismatch|trailing"):
        decode_png(bytes(data))
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"not a png at all")


def test_adam7_interlaced_roundtrip_all_filters_and_shapes():
    """Adam7 decode (web preview/icon PNGs): every pass unfilters
    independently and scatters into place.  Round-trip across awkward
    dims (empty passes at 1×1 and 2×3, the classic off-by-one pass-4/6
    y-origins at 3×17) must reproduce the array exactly for every
    filter type and channel count."""
    rng = np.random.default_rng(4)
    for shape in [(1, 1), (2, 3), (8, 8), (9, 5), (3, 17), (20, 33)]:
        for ch in (1, 2, 3, 4):
            img = rng.integers(0, 256, (*shape, ch)).astype(np.uint8)
            for ft in range(5):
                enc = encode_png(img, filter_type=ft, interlace=True)
                assert enc[28] == 1  # IHDR interlace flag really set
                assert np.array_equal(decode_png(enc), img), (shape, ch, ft)


def test_png_hypothesis_roundtrip_fuzz():
    """Property sweep over the whole encode surface: any dims ×
    channels × filter × interlace (plus palette at any depth) must
    round-trip to the exact array.  Hypothesis shrinks whatever the
    fixed matrices missed (the Adam7 pass-table bug was exactly a
    shape-dependent corner)."""
    from hypothesis import given, settings, strategies as st

    from big_data_exercise_spark.multimodal.png import encode_png_paletted

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        ft=st.integers(0, 4),
        inter=st.booleans(),
        deep=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def run(h, w, ch, ft, inter, deep, seed):
        rng = np.random.default_rng(seed)
        if deep:  # 16-bit samples, big-endian on the wire
            img = rng.integers(0, 65536, (h, w, ch)).astype(np.uint16)
        else:
            img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        enc = encode_png(img, filter_type=ft, interlace=inter)
        dec = decode_png(enc)
        assert dec.dtype == img.dtype
        assert np.array_equal(dec, img)

    run()

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        depth=st.sampled_from([1, 2, 4, 8]),
        ft=st.integers(0, 4),
        inter=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def run_pal(h, w, depth, ft, inter, seed):
        rng = np.random.default_rng(seed)
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        idx = rng.integers(0, n, (h, w)).astype(np.uint8)
        enc = encode_png_paletted(
            idx, pal, depth, filter_type=ft, interlace=inter
        )
        assert np.array_equal(decode_png(enc), pal[idx])

    run_pal()


def test_png_empty_dims_rejected():
    from big_data_exercise_spark.multimodal.png import encode_png_paletted

    pal = np.zeros((2, 3), np.uint8)
    for bad in [(0, 5), (5, 0)]:
        with pytest.raises(ValueError, match="positive"):
            encode_png(np.zeros(bad, np.uint8))
        with pytest.raises(ValueError, match="positive"):
            encode_png_paletted(np.zeros(bad, np.uint8), pal)
    # a crafted stream claiming zero width must be rejected, not crash
    import struct as _s
    import zlib as _z

    data = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
    data[16:20] = _s.pack(">I", 0)  # IHDR width = 0
    ihdr = bytes(data[12:16]) + bytes(data[16:29])
    data[29:33] = _s.pack(">I", _z.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(PngFormatError, match="zero dimension"):
        decode_png(bytes(data))


def test_paletted_roundtrip_all_depths():
    """Color-type-3 decode (the dominant web icon/sprite encoding):
    packed sub-byte indices at depths 1/2/4/8, plain and interlaced,
    look up to exactly palette[indices]."""
    from big_data_exercise_spark.multimodal.png import encode_png_paletted

    rng = np.random.default_rng(5)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        for shape in [(1, 1), (5, 9), (13, 21)]:
            idx = rng.integers(0, n, shape).astype(np.uint8)
            for inter in (False, True):
                for ft in (0, 1, 4):
                    enc = encode_png_paletted(
                        idx, pal, depth, filter_type=ft, interlace=inter
                    )
                    assert np.array_equal(decode_png(enc), pal[idx]), (
                        depth, shape, inter, ft,
                    )
    with pytest.raises(ValueError, match="out of range"):
        encode_png_paletted(
            np.full((2, 2), 9, np.uint8), pal[:4], bit_depth=4
        )


def test_jpeg_meta_parses_sof_and_rejects_non_jpeg():
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x11\x00"
    assert jpeg_meta(b"\xff\xd8" + app0 + sof + b"\xff\xd9") == (640, 480, 3)
    with pytest.raises(ValueError):
        jpeg_meta(b"\x89PNG\r\n\x1a\n")


def test_decode_frame_meta_takes_real_png_and_jpeg_branches(spark):
    """The Spark metadata operator must classify real PNG bytes (and a
    header-only JPEG) through the REAL branch — codec strings 'png' /
    'jpeg', dimensions from actual header parsing."""
    from big_data_exercise_spark.multimodal.codecs import decode_frame_meta

    png_bytes = encode_png(
        np.zeros((30, 40, 3), dtype=np.uint8), filter_type=2
    )
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x11\x00"
    jpeg_bytes = b"\xff\xd8" + app0 + sof + b"\xff\xd9"
    frames = spark.createDataFrame(
        [(1, 1, bytearray(png_bytes)), (1, 2, bytearray(jpeg_bytes))],
        "camera_id long, frame_number long, frame binary",
    )
    got = {r["frame_number"]: r for r in decode_frame_meta(frames).collect()}
    assert (got[1]["codec"], got[1]["width"], got[1]["height"]) == ("png", 40, 30)
    assert (got[2]["codec"], got[2]["width"], got[2]["height"]) == ("jpeg", 640, 480)


def test_resize_frames_real_png_pixels(spark):
    """resize_frames on PNG input runs the FULL real path: decode,
    nearest-neighbour resample, re-encode — verified by decoding the
    output and checking shape and the deterministic index map."""
    from big_data_exercise_spark.multimodal.codecs import resize_frames

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    frames = spark.createDataFrame(
        [(1, 1, bytearray(encode_png(img, filter_type=4)))],
        "camera_id long, frame_number long, frame binary",
    )
    out_bytes = bytes(resize_frames(frames, width=16).collect()[0]["frame"])
    out = decode_png(out_bytes)
    ys = (np.arange(12) * 24) // 12
    xs = (np.arange(16) * 32) // 16
    assert out.shape == (12, 16, 3)
    assert (out == img[ys][:, xs]).all()


def test_png_against_external_decoder_if_available():
    """Optional-dependency cross-check: wherever PIL or cv2 exists,
    our encoder's bytes must decode identically through the external
    library — the lane that lights up outside this container."""
    img = np.arange(9 * 7 * 3, dtype=np.uint8).reshape(9, 7, 3)
    data = encode_png(img, filter_type=4)
    try:
        from PIL import Image  # noqa: F401

        ext = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert (ext == img).all()
        return
    except ImportError:
        pass
    cv2 = pytest.importorskip("cv2")
    ext = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert (ext[:, :, ::-1] == img).all()  # cv2 is BGR
