"""Keyword sentiment scorer — the engine's analog of the reference's
ABSA inference UDF (U1/U2).

The reference runs a transformer inside a pandas_udf with a
deterministic keyword fallback when the model artifact is missing
(consumer_postgres_streaming.py:257-327, fallback :329-368; decode
:373-389). We keep exactly that architecture — lazy per-worker
scorer, Arrow-batched pandas UDF, deterministic rules — but make the
deterministic path the primary one so every result is
oracle-checkable. Swapping in a real model is a one-line change to
``_score_batch`` (load-once singleton, same signature).

The rule set is defined over the corpus vocabulary: 'fast'/'small'
positive, 'slow'/'big' negative; label = POS / NEG / NEU by count
comparison (ties and no-hits → NEU), mirroring the reference's
keyword-count fallback semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

POSITIVE = ("fast", "small")
NEGATIVE = ("slow", "big")

_RESULT_TYPE = T.StructType(
    [
        T.StructField("n_pos", T.IntegerType()),
        T.StructField("n_neg", T.IntegerType()),
        T.StructField("label", T.StringType()),
    ]
)


def _score_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized scoring of one Arrow batch. A real model drops in
    here as a per-worker lazy singleton (the reference's pattern at
    consumer_postgres_streaming.py:259-294)."""
    def score(text: str) -> tuple[int, int, str]:
        words = text.split() if isinstance(text, str) else []
        n_pos = sum(1 for w in words if w in POSITIVE)
        n_neg = sum(1 for w in words if w in NEGATIVE)
        label = "POS" if n_pos > n_neg else ("NEG" if n_neg > n_pos else "NEU")
        return n_pos, n_neg, label

    scored = texts.map(score)
    return pd.DataFrame(
        {
            "n_pos": scored.map(lambda t: t[0]),
            "n_neg": scored.map(lambda t: t[1]),
            "label": scored.map(lambda t: t[2]),
        }
    )


sentiment_udf = F.pandas_udf(_score_batch, _RESULT_TYPE)


def score_documents(documents: DataFrame) -> DataFrame:
    """Struct-returning pandas UDF + flatten (the U4 'struct result'
    shape, fire_consumer_streaming.py:146-233, re-expressed)."""
    scored = documents.select(
        "doc_id", sentiment_udf(F.col("text")).alias("s")
    )
    return scored.select(
        "doc_id",
        F.col("s.n_pos").alias("n_pos"),
        F.col("s.n_neg").alias("n_neg"),
        F.col("s.label").alias("label"),
    )


def sentiment_distribution(documents: DataFrame) -> DataFrame:
    """Sentiment histogram per language — the streamlit_app.py:76-81
    value-counts dashboard query, computed in Spark over the UDF
    output."""
    return (
        score_documents(documents)
        .join(documents.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "label")
        .agg(F.count("*").alias("n"))
    )
