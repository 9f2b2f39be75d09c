"""N-gram shingle Jaccard similarity — the exact (quadratic-in-bucket)
baseline the approximate dedup methods are validated against.

Shingles are built relationally: ``F.sequence`` over token positions +
``F.transform`` concatenation — no UDF, no driver loop. The all-pairs
verification is restricted to an explicit doc_id window (or to LSH
candidates via ``dedup.minhash``); never run unblocked at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_exercise_spark.functions.numeric import round_det_nn
from big_data_exercise_spark.functions.text import tokens


def shingles(toks, n: int = 3):
    """Distinct word n-gram shingles (array<string>) over a token-array
    column ``toks``.

    Pass a MATERIALIZED column (an alias projected in its own step),
    not the ``tokens(text)`` expression: an expression captured in a
    transform lambda re-evaluates per element, so tokenize-inside-the-
    lambda is O(len²) per document (the round-9 contamination
    straggler class). The n-gram is a bounded slice+concat — with a
    bound array, linear overall."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def pairwise_jaccard(
    documents: DataFrame, n: int = 3, max_doc_id: int = 30, min_jaccard: float = 0.0
) -> DataFrame:
    """Exact shingle-Jaccard over all pairs within a bounded doc_id
    window (the verification kernel; blocking comes from LSH or an
    explicit window)."""
    docs = (
        documents.filter(F.col("doc_id") < max_doc_id)
        .select("doc_id", tokens(F.col("text")).alias("__t"))
        .select("doc_id", shingles(F.col("__t"), n).alias("sh"))
    )
    a = docs.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
    b = docs.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"))
    # intersect/union materialized once (a non-cheap alias used more
    # than once never gets inlined back by CollapseProject), and the
    # rounding is the single-reference round_det_nn so the min_jaccard
    # filter pushed into the join condition substitutes the expensive
    # argument exactly once. The __uni > 0 guard excludes the only
    # out-of-domain input (0/0 for two shingle-less docs) — such a
    # pair can never pass jaccard > min_jaccard ≥ 0 anyway, so the
    # emitted rows are unchanged.
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("sh1", "sh2")).alias("__inter"),
            F.size(F.array_union("sh1", "sh2")).alias("__uni"),
        )
        .filter(F.col("__uni") > 0)
        .select(
            "id1",
            "id2",
            round_det_nn(F.col("__inter") / F.col("__uni"), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") > F.lit(min_jaccard))
    )
