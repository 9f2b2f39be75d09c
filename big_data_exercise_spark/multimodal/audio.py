"""Binary audio columns: synthesize, decode, windowed segment energy.

Audio rides the same design as frames (multimodal/codecs.py): opaque
``binary`` clips with typed metadata and Arrow-batched mapInPandas
for anything that must touch samples.  Clips are REAL RIFF/WAVE PCM
files (the one audio container that needs nothing beyond ``struct``
and numpy — the same no-external-libs discipline as the PNG/JPEG
codecs): canonical 44-byte header, 8/16-bit integer PCM, mono or
multi-channel, unknown chunks (LIST/fact/cue) skipped with RIFF's
odd-size pad rule.  Compressed formats (MP3/Opus/FLAC) still need
soundfile/librosa — swap ``decode_wav`` behind the same iterator; the
lazy-per-worker-load pattern is identical to the reference's model
singleton (consumer_postgres_streaming.py:259-266).

Synthesized sample values stay the closed form
``sample_i = ((seed*2654435761 + i*40503) mod 65536) - 32768`` (a
direct function of i, not a recurrence), which is what lets a SQL
oracle recompute window energies without parsing binary — the WAV
container changes the BYTES, never the samples, so the hash-checked
oracle is container-independent.  The legacy b"FAKEPCM0" framing is
still decoded for stored columns written by earlier versions.

Scale shape: synthesis and decoding are per-row (zero shuffle);
windowed energy explodes |clip|/win rows per clip — partition-local.
Windowed sums use int64 arithmetic end to end: exact, no float drift.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAGIC = b"FAKEPCM0"
SAMPLE_RATE = 16000
WIN = 64  # samples per energy window


def _n_samples(event_id: int) -> int:
    # 4-10 full windows per clip, deterministic per event
    return 256 + (event_id % 7) * 64


def _samples(seed: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return ((seed * 2654435761 + i * 40503) % 65536) - 32768


def encode_fake_clip(seed: int, n: int, rate: int = SAMPLE_RATE) -> bytes:
    """Legacy self-describing framing (kept for stored columns)."""
    pcm = _samples(seed, n).astype("<i2").tobytes()
    return MAGIC + struct.pack(">IIQ", rate, n, seed) + pcm


def encode_wav(
    samples: np.ndarray, rate: int = SAMPLE_RATE, bits: int = 16
) -> bytes:
    """int array (n,) mono or (n, ch) → canonical RIFF/WAVE PCM bytes
    (fmt chunk audio format 1; 8-bit stored unsigned per spec, 16-bit
    little-endian signed; odd-length data chunks get RIFF's pad
    byte)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        payload = samples.astype("<i2").tobytes()
    elif bits == 8:
        s64 = samples.astype(np.int64)
        if samples.size and (s64.min() < -128 or s64.max() > 127):
            raise ValueError("8-bit samples must lie in [-128, 127]")
        payload = (s64 + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    data = payload + (b"\x00" if len(payload) % 2 else b"")
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM → (sample_rate, int16 array (n, ch)).  Walks the
    chunk list (skipping LIST/fact/cue/… with the odd-size pad rule),
    accepts 8- and 16-bit integer PCM; raises ValueError on non-PCM
    encodings or malformed structure.  8-bit samples are widened to
    the signed 16-bit scale's domain by the usual −128 recenter (kept
    at their 8-bit magnitudes — energy math stays exact int64)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    # walk only the declared RIFF body — downloaded files often carry
    # trailing appended bytes (tags, padding) that are NOT chunks
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(
                    f"only integer PCM supported (audio format {audio_fmt})"
                )
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
            if ch < 1:
                raise ValueError("fmt chunk declares zero channels")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # RIFF pads odd chunks
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    ch, rate, bits = fmt
    block = ch * (bits // 8)
    if len(pcm) % block:
        raise ValueError(
            f"data chunk size {len(pcm)} is not a multiple of the "
            f"{block}-byte frame (channels={ch}, bits={bits})"
        )
    if bits == 16:
        arr = np.frombuffer(pcm, "<i2")
    else:
        arr = np.frombuffer(pcm, np.uint8).astype(np.int16) - 128
    return rate, arr.reshape(-1, ch).astype(np.int16)


def synthesize_clips(events: DataFrame, limit: int = 200) -> DataFrame:
    """Deterministic binary clips keyed by event_id (pandas_udf,
    Arrow-batched). Bounded by ``limit`` lowest event_ids so the
    downstream explode is test-sized; at scale drop the limit."""

    @F.pandas_udf("binary")
    def make_clip(event_id: pd.Series) -> pd.Series:
        return event_id.map(
            lambda e: encode_wav(_samples(int(e), _n_samples(int(e))))
        )

    return (
        events.filter(F.col("event_id") < limit)
        .select("event_id", "user_id")
        .withColumn("clip", make_clip("event_id"))
    )


def segment_energy(clips: DataFrame, win: int = WIN) -> DataFrame:
    """Windowed mean-square energy per clip segment — the framing op
    every audio feature extractor starts with (VAD, loudness
    normalization, silence trimming). mapInPandas parses the binary
    header + int16 payload and emits one row per full window:
    (event_id, seg, n_windows, energy) with energy = Σ s² (int64,
    exact)."""

    def seg_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"event_id": [], "seg": [], "n_windows": [], "energy": []}
            for eid, buf in zip(pdf["event_id"], pdf["clip"]):
                # corrupt/foreign blobs of EITHER framing are skipped,
                # never crash the task (struct.error is not a
                # ValueError subclass — both must be caught)
                buf = bytes(buf)
                try:
                    if buf[:4] == b"RIFF":  # real WAV branch
                        _rate, arr = decode_wav(buf)
                    elif buf[:8] == MAGIC:  # legacy framing
                        _rate, n, _seed = struct.unpack(">IIQ", buf[8:24])
                        arr = np.frombuffer(
                            buf[24 : 24 + 2 * n], dtype="<i2"
                        ).reshape(-1, 1)
                    else:
                        continue
                except (ValueError, struct.error):
                    continue
                # windows are per FRAME (sample instant); energy sums
                # s² over every channel in the window — mono clips
                # (all this repo synthesizes) are unaffected, stereo
                # clips count both channels instead of silently
                # dropping one
                pcm = arr.astype(np.int64)
                k = len(pcm) // win
                for j in range(k):
                    w = pcm[j * win:(j + 1) * win]
                    out["event_id"].append(int(eid))
                    out["seg"].append(j)
                    out["n_windows"].append(k)
                    out["energy"].append(int((w * w).sum()))
            yield pd.DataFrame(out)

    return clips.mapInPandas(
        seg_iter, "event_id long, seg int, n_windows int, energy long"
    )


def audio_segment_energy(events: DataFrame) -> DataFrame:
    """synthesize → decode → window: the full audio pass."""
    return segment_energy(synthesize_clips(events))
