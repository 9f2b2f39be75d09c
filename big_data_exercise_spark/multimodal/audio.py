"""Binary audio columns: synthesize, decode, windowed segment energy.

Audio rides the same design as frames (multimodal/codecs.py): opaque
``binary`` clips with typed metadata, Arrow-batched mapInPandas for
anything that must touch samples, and a deterministic FAKE codec so
the Spark-side plumbing (schema, batch shape, explode) is real and
oracle-checkable without audio libs in the container. A real pipeline
swaps ``_decode_samples`` for soundfile/librosa behind the same
iterator — the lazy-per-worker-load pattern is identical to the
reference's model singleton (consumer_postgres_streaming.py:259-266).

FAKE clip format (deterministic, self-describing):
    b"FAKEPCM0" | sample_rate:4 BE | n_samples:4 BE | seed:8 BE |
    int16-LE PCM payload, sample_i = ((seed*2654435761 + i*40503)
    mod 65536) - 32768
The closed-form sample function (not a recurrence) is what lets a
SQL oracle recompute window energies without parsing binary.

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
    pcm = _samples(seed, n).astype("<i2").tobytes()
    return MAGIC + struct.pack(">IIQ", rate, n, seed) + pcm


def synthesize_clips(events: DataFrame, limit: int = 200) -> DataFrame:
    """Deterministic binary clips keyed by event_id (pandas_udf,
    Arrow-batched). Bounded by ``limit`` lowest event_ids so the
    downstream explode is test-sized; at scale drop the limit."""

    @F.pandas_udf("binary")
    def make_clip(event_id: pd.Series) -> pd.Series:
        return event_id.map(
            lambda e: encode_fake_clip(int(e), _n_samples(int(e)))
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
                buf = bytes(buf)
                if buf[:8] != MAGIC:
                    continue  # foreign blob: skip, never crash the task
                _rate, n, seed = struct.unpack(">IIQ", buf[8:24])
                pcm = np.frombuffer(buf[24:24 + 2 * n], dtype="<i2").astype(
                    np.int64
                )
                k = n // win
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
