"""Python UDTF surface (one-row-in, many-rows-out table function).

The reference realizes one-to-many UDFs as array-returning pandas
UDFs + explode (U3, vehicle_consumer.py:119-183) — covered by
multimodal.detections. Spark 4's native UDTF API is the other
idiomatic route: the function IS a relation, usable in a FROM-clause
LATERAL join. Kept deterministic (regex sentence split) so the DuckDB
oracle replays it.

Scale note: UDTFs execute row-at-a-time in Python workers — fine for
fan-out parsing, but for numeric batch work prefer Arrow-batched
pandas UDFs (10-100× less overhead). This module exists for API
completeness and parser-shaped workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


# Explicit ASCII-whitespace trim set. Python's bare str.strip() is
# Unicode-whitespace-aware (strips NBSP, U+2028, …) which no SQL
# trim() replays — and SQL trim() defaults to SPACES ONLY, which
# leaves 'the\t' untrimmed (live divergence found by the round-8
# random-corpus fuzz on [(0, 'the\t', …)]). The pinned contract is
# the ASCII set below on BOTH engines.
_WS = " \t\n\r\v\f"


@udtf(returnType="sent_idx: int, sentence: string, n_chars: int")
class SplitSentences:
    """text → one row per '.'-delimited non-empty sentence
    (ASCII-whitespace-trimmed; see _WS)."""

    def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
        if text is None:
            return
        idx = 0
        for part in text.split("."):
            part = part.strip(_WS)
            if part:
                yield idx, part, len(part)
                idx += 1


def doc_sentences(spark: SparkSession, documents: DataFrame, max_doc_id: int = 20) -> DataFrame:
    """LATERAL join documents × SplitSentences — the UDTF as a
    relation. Returns (doc_id, sent_idx, sentence, n_chars)."""
    spark.udtf.register("split_sentences", SplitSentences)
    documents.filter(documents.doc_id < max_doc_id).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )
