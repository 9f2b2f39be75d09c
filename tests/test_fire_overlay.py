"""fire_overlay_detections: decode-back + emission-rule + streaming
parity lanes.

The registry's `fire_overlay_accounting` twin hash-checks the mask
stats, the confidence arithmetic and the emission rule against
regenerated pixels; these lanes pin what that oracle cannot see — the
JPEG BYTES in `image_base64` (decode them back with the repo's own
decoder and verify mask-pixel recovery against the analytically
expected blend) and the stateless-stream claim (identical output,
bytes included, when the same operator runs on the streaming source).

Reference shape: fire_consumer_streaming.py:166-206 (mask colorize →
0.6/0.4 addWeighted blend → JPEG q85 → base64, emitted for every 5th
frame or any detection) and table shape :225-233.
"""

from __future__ import annotations

import base64
import os

import numpy as np
import pytest

from big_data_exercise_spark.multimodal import codecs
from big_data_exercise_spark.multimodal.jpeg import decode_jpeg
from big_data_exercise_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = 127


def _expected_blend(e: int, u: int):
    """The analytically expected overlay image: synthesis formula →
    mask → red colorize → 0.6/0.4 blend, half-away-from-zero to uint8
    (the operator's documented rounding rule)."""
    w = 16 + (u % 4) * 8
    h = 12 + (e % 3) * 4
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((e + xx + yy) % 251).astype(np.uint8)[..., None].repeat(3, -1)
    mask = img[..., 0] > THRESHOLD
    over = img.copy()
    over[mask] = (255, 0, 0)
    blend = 0.6 * img.astype(np.float64) + 0.4 * over
    return np.floor(blend + 0.5).clip(0, 255).astype(np.uint8), mask


@pytest.fixture(scope="module")
def overlay_rows(spark):
    return codecs.fire_overlay_detections(
        load_table(spark, SF_DIR, "events")
    ).collect()


def test_emission_rule(overlay_rows):
    """image_base64 is non-NULL exactly for every 5th frame or any
    detection (the reference's ``save_image or fire_detected``), and
    the corpus exercises BOTH sides of the rule."""
    assert overlay_rows
    emitted = 0
    for r in overlay_rows:
        want = r["fire_detected"] or r["frame_number"] % 5 == 0
        assert (r["image_base64"] is not None) == want, r["frame_number"]
        emitted += want
    assert 0 < emitted < len(overlay_rows)


def test_overlay_decodes_back_to_masked_blend(overlay_rows):
    """Decode every emitted overlay with the repo's own JPEG decoder:
    dimensions match the synthesis, per-pixel MAE vs the expected
    blend stays inside JPEG-q85 tolerance (measured 0.53 max on this
    corpus; gate at 3), the mask region is unambiguously red
    (mean R−G > 60 — the blend puts +102 of red-minus-green on mask
    pixels) and the non-mask region is channel-balanced (the
    gradient's channels are identical, so R−G ≈ 0)."""
    checked = 0
    for r in overlay_rows:
        if r["image_base64"] is None:
            continue
        dec = decode_jpeg(base64.b64decode(r["image_base64"]))
        exp, mask = _expected_blend(r["frame_number"], r["camera_id"])
        assert dec.shape == exp.shape
        d = dec.astype(int)
        mae = np.abs(d - exp.astype(int)).mean()
        assert mae < 3.0, (r["frame_number"], mae)
        rg = d[..., 0] - d[..., 1]
        if mask.any():
            assert rg[mask].mean() > 60, r["frame_number"]
        if (~mask).any():
            assert abs(rg[~mask].mean()) < 10, r["frame_number"]
        checked += 1
    assert checked > 0


def test_confidence_is_mean_brightness(overlay_rows):
    """confidence = round(mean gray / 255, 4) — the deterministic
    analog of the reference's mean predicted probability."""
    for r in overlay_rows:
        e, u = r["frame_number"], r["camera_id"]
        w = 16 + (u % 4) * 8
        h = 12 + (e % 3) * 4
        yy, xx = np.mgrid[0:h, 0:w]
        gray = (e + xx + yy) % 251
        want = round(float(gray.sum()) / (gray.size * 255), 4)
        assert abs(r["confidence"] - want) < 1e-9, (e, r["confidence"], want)


def test_streaming_lane_matches_batch(spark, overlay_rows):
    """The operator is stateless (filter → Arrow map → projections),
    so the SAME function on the streaming source must emit the SAME
    rows — including byte-identical overlay JPEGs (the encoder is
    deterministic)."""
    from big_data_exercise_spark.streaming import pipelines as streams

    out = streams.run_to_memory(
        codecs.fire_overlay_detections(streams.stream_events(spark, SF_DIR)),
        "append",
    )
    got = sorted(
        (tuple(r) for r in out.collect()), key=lambda t: (t[0], t[1])
    )
    want = sorted((tuple(r) for r in overlay_rows), key=lambda t: (t[0], t[1]))
    assert got == want
