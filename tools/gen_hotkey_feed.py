"""Dedicated hot-key streaming feed (round 10, VERDICT item 1).

The gen_skewed twin plants its user skew BEFORE the event_type skew
(modal type 60 %), so the hot user's CLICK+PURCHASE mass — the only
rows a stream-stream attribution join buffers — is diluted to a few
percent and the round-9 hot-state ceiling does not reproduce on the
current engine at either sf0.1 or sf1 (measured by
tools/skew_stream_soak.py: skew/unsalted p95 within 1.5x of uniform).

This generator writes the UNDILUTED hostile case: one user owns
``--hot-frac`` (default 0.4) of all events, every hot row is a click
(60 %) or purchase (40 %), the rest draw uniformly over users and the
full type pool. With 1M rows over 3 days the hot state partition then
buffers thousands of clicks per watermark window against thousands of
purchases per batch — the quadratic per-partition probe volume the
salted plan exists to spread.

A '--uniform' twin (same row count, same type mix, no hot user) is
written alongside for the same-rate baseline.

Usage: python tools/gen_hotkey_feed.py --out /tmp/bdes_hotkey \
           [--rows 1000000] [--hot-frac 0.4]
writes {out}/events.parquet and {out}_uniform/events.parquet
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260816
T0_US = 1704067200_000_000  # 2024-01-01
SPAN_S = 3 * 24 * 3600
TYPES = np.array(["click", "view", "purchase", "signup", "error"])


def _write(out: str, user_id: np.ndarray, etype: np.ndarray, rng) -> None:
    n = len(user_id)
    ts = T0_US + rng.integers(0, SPAN_S * 1_000_000, n)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(etype.astype(object), pa.string()),
            "value": pa.array(
                rng.integers(0, 10_000, n).astype(np.float64) / 100.0
            ),
            "props": pa.array(np.full(n, "{}", dtype=object), pa.string()),
        }
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bdes_hotkey")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=20_000)
    ap.add_argument("--hot-frac", type=float, default=0.4)
    args = ap.parse_args()
    rng = np.random.default_rng(SEED)
    n = args.rows
    n_hot = int(n * args.hot_frac)

    user = rng.integers(1, args.users, n)
    etype = TYPES[rng.integers(0, len(TYPES), n)]
    user[:n_hot] = 0  # the hot key
    etype[:n_hot] = np.where(
        rng.random(n_hot) < 0.6, "click", "purchase"
    )
    perm = rng.permutation(n)
    _write(args.out, user[perm], etype[perm], rng)

    user_u = rng.integers(0, args.users, n)
    etype_u = TYPES[rng.integers(0, len(TYPES), n)]
    _write(args.out + "_uniform", user_u, etype_u, rng)
    print(
        f"wrote {args.out} (hot user 0: {n_hot}/{n} rows, click/purchase only) "
        f"and {args.out}_uniform"
    )


if __name__ == "__main__":
    main()
