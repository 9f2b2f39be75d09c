"""Grouped Python execution surfaces: pandas UDAF (GROUPED_AGG) and
grouped-map ``applyInPandas``.

These complete the UDF taxonomy next to the scalar pandas_udf
(sentiment), mapInPandas (multimodal), UDTF (sentences) and
applyInPandasWithState (streaming): a custom *aggregate* that Spark
merges per group, and a custom *group → frame* transform. Both are
Arrow-batched; both run inside a normal hash-partitioned groupBy, so
they inherit Spark's shuffle/skew machinery unchanged.

Parity discipline: the UDAF accumulates integral cents (floor(v·100 +
0.5) — the same IEEE ops as the oracle's FLOOR), and the grouped map
emits integer sequence numbers — nothing float-ordering-dependent
crosses the engine boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _cents_total():
    # Defined lazily: pandas_udf parses its DDL return type against the
    # active session, so the decorator can't run at import time.
    @pandas_udf("long")
    def cents_total(v: pd.Series) -> int:
        # Integral cents: each term is an exact float64 integer (values
        # are few-digit currency), so the sum is exact below 2^53.
        # SQL-SUM NULL parity: Series.sum() already skips NaN (Arrow
        # maps NULL→NaN on the way in), but an all-NULL group must
        # yield NULL — pandas' sum of nothing is 0.0, SQL's is NULL
        # (round-8 NULL-dirt fuzz finding).
        if v.count() == 0:
            return None
        return int(np.floor(v * 100 + 0.5).sum())

    # Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() — so the row count is a pandas UDAF too.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(v.size)

    return cents_total, n_rows


def cents_by_type(events: DataFrame) -> DataFrame:
    """Custom pandas UDAF per group: total value in integer cents.
    Spark evaluates the UDAF per partition-group after the hash
    shuffle; at 100 TB it behaves exactly like a built-in aggregate
    minus map-side partial combine (the documented GROUPED_AGG cost —
    whole groups cross the shuffle, so keep group payloads narrow)."""
    _cents, _n = _cents_total()
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .agg(
            _cents(F.col("value")).alias("total_cents"),
            _n(F.col("value")).alias("n_events"),
        )
    )


def user_event_sequence(events: DataFrame, max_user_id: int = 25) -> DataFrame:
    """Grouped-map applyInPandas: each user's events ordered and
    numbered inside ONE pandas frame — the escape hatch for per-group
    logic a window can't express (here it deliberately mirrors
    row_number so the oracle can replay it). The whole group
    materializes in executor memory: bound group size (or pre-filter,
    as here) before reaching for this API at scale."""

    def seq(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["seq"] = np.arange(1, len(pdf) + 1, dtype="int32")
        return pdf[["user_id", "event_id", "seq"]]

    return (
        events.filter(F.col("user_id") < max_user_id)
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(seq, "user_id long, event_id long, seq int")
    )


def cogrouped_user_order_stats(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Cogrouped applyInPandas — the two-sided grouped map: both
    tables' rows for one key arrive as two pandas frames in one
    function call. This is the escape hatch for merge logic a join
    can't express (as-of alignment, per-key reconciliation, custom
    conflict resolution); here it deliberately computes counts a FULL
    OUTER aggregate join replays, so the oracle can check the key
    semantics — keys from EITHER side must appear exactly once."""

    def merge(key, ev_pdf: pd.DataFrame, ord_pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(ev_pdf)],
                "n_orders": [len(ord_pdf)],
            }
        )

    ev = events.select("user_id")
    od = orders.select(F.col("o_custkey").alias("user_id")).filter(
        F.col("user_id") < 200
    )
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(merge, "user_id long, n_events long, n_orders long")
    )
