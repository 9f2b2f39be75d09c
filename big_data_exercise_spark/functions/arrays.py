"""Array / embedding column math (SURVEY.md §2.9 array surface).

The reference slices a flat float array of model probabilities in
Python (consumer_postgres_streaming.py:382-386: 8 aspect probs +
8×3 sentiment triplets, argmax per triplet). Here that surface is
native Column algebra — slice / element_at / array_max /
array_position / aggregate — evaluated JVM-side.

All reductions cast float32 elements to double *before* summing so
results are exact-order deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns via zip_with +
    aggregate (JVM codegen; no UDF)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def argmax_position(a: Column) -> Column:
    """1-based index of the max element (the reference's argmax over
    sentiment triplets, consumer_postgres_streaming.py:386)."""
    return F.array_position(a, F.array_max(a))


def slice_sum(a: Column, start: int, length: int) -> Column:
    """Sum of a slice (the 'first 8 aspect probabilities' pattern)."""
    piece = F.transform(F.slice(a, start, length), lambda x: x.cast("double"))
    return F.aggregate(piece, F.lit(0.0), lambda acc, v: acc + v)


def embedding_stats(embeddings: DataFrame) -> DataFrame:
    """Per-vector array analytics: argmax position, head-slice sum,
    L2 norm — all codegen'd Column algebra."""
    e = F.col("embedding")
    return embeddings.select(
        "vec_id",
        "label",
        argmax_position(e).cast("int").alias("argmax_pos"),
        F.round(slice_sum(e, 1, 8), 4).alias("head8_sum"),
        F.round(norm(e), 4).alias("l2_norm"),
    )


def embedding_predicates(embeddings: DataFrame) -> DataFrame:
    """Higher-order-function surface over array columns: exists /
    forall / filter run as codegen'd lambda expressions inside the JVM
    — the scale-correct way to ask per-element questions of an
    embedding without a UDF or an explode+regroup shuffle."""
    emb = F.col("embedding")
    return embeddings.select(
        "vec_id",
        F.exists(emb, lambda x: x < 0).alias("any_negative"),
        F.forall(emb, lambda x: F.abs(x) < 1.0).alias("all_unit_bounded"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )
