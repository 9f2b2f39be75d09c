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

    Like minhash, the signature/banding/join runs once per DISTINCT
    simhash value (docs with identical token sets — or merely
    sign-identical bit sums — collapse), then pairs expand back
    through the membership table: same-hash pairs at distance 0,
    cross-hash pairs with the representative distance. On duplicative
    corpora the bucket join shrinks quadratically with cluster size.
    """
    # Persist: consumed by the groupBy AND the expansion joins.
    sigs = simhash_signatures(documents).persist()
    reps = sigs.groupBy("simhash").agg(F.min("doc_id").alias("rep_id")).persist()

    banded = None
    for b in range(BANDS):
        piece = reps.select(
            "simhash",
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
            .alias("key"),
        )
        banded = piece if banded is None else banded.unionByName(piece)
    left = banded.select(F.col("simhash").alias("sh1"), "band", "key")
    right = banded.select(F.col("simhash").alias("sh2"), "band", "key")
    hash_pairs = (
        left.join(right, ["band", "key"])
        .filter(F.col("sh1") < F.col("sh2"))
        .select("sh1", "sh2", hamming(F.col("sh1"), F.col("sh2")).alias("distance"))
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )

    m1 = sigs.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("sh1"))
    m2 = sigs.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("sh2"))
    cross = (
        hash_pairs.join(m1, "sh1")
        .join(m2, "sh2")
        .select(
            F.least("d1", "d2").alias("id1"),
            F.greatest("d1", "d2").alias("id2"),
            "distance",
        )
    )
    intra = (
        m1.join(m2, (m1.sh1 == m2.sh2) & (m1.d1 < m2.d2))
        .select(
            F.col("d1").alias("id1"),
            F.col("d2").alias("id2"),
            F.lit(0).cast("integer").alias("distance"),
        )
    )
    if max_distance < 0:
        return cross
    return cross.unionByName(intra)
