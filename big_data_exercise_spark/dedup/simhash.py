"""SimHash near-duplicate detection (64-bit).

Per doc: hash each distinct token to 64 bits (xxhash64), sum ±1 per
bit position over tokens, simhash bit i = (sum_i > 0). Candidates:
split the 64 bits into four 16-bit bands; docs sharing any band value
are compared by Hamming distance (bit_count of xor).

All relational: explode → 64 conditional sums in ONE groupBy (a
single shuffle with map-side combine) → band bucketing join. xxhash64
is Spark-internal, so this operator is verified by property tests
(duplicate texts → distance 0; perturbations → small distance), not a
SQL oracle — recorded as a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_exercise_spark.functions.text import tokens

BITS = 64
BANDS = 4
BAND_BITS = BITS // BANDS


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash long) — one shuffle."""
    from big_data_exercise_spark.tables import ensure_parallelism

    documents = ensure_parallelism(documents)  # tokenize+64 sums are CPU-bound
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(BITS)
    ]
    sums = toks.groupBy("doc_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(BITS):
        # shiftleft (not Python <<, undefined on Column); JVM-side shift
        # wraps bit 63 into the sign bit, which is fine for a bit pattern.
        sim = sim + F.when(
            F.col(f"s{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", sim.alias("simhash"))


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def near_duplicates(documents: DataFrame, max_distance: int = 3) -> DataFrame:
    """Banded SimHash near-dup pairs: (id1, id2, distance ≤ max).

    With 4 bands of 16 bits, any pair within Hamming distance 3 shares
    at least one exact band (pigeonhole) → no recall loss vs all-pairs
    at bucket-join cost.
    """
    # Persist: the banded self-join consumes the signature table on
    # BOTH sides; without the cache boundary Spark recomputes the
    # tokenize + 64-conditional-sum subtree twice. One (doc_id, long)
    # row per doc — trivially cacheable at any scale.
    sigs = simhash_signatures(documents).persist()
    banded = None
    for b in range(BANDS):
        piece = sigs.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
            .alias("key"),
        )
        banded = piece if banded is None else banded.unionByName(piece)
    left = banded.select(
        F.col("doc_id").alias("id1"), F.col("simhash").alias("sh1"), "band", "key"
    )
    right = banded.select(
        F.col("doc_id").alias("id2"), F.col("simhash").alias("sh2"), "band", "key"
    )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2", hamming(F.col("sh1"), F.col("sh2")).alias("distance")
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )
