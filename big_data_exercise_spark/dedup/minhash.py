"""MinHash + LSH near-duplicate detection.

Pipeline (all relational, no UDFs):

1. tokenize → distinct tokens per doc (set semantics);
2. map token → integer id. Two modes:
   * ``vocab_rank`` (default): ids are the rank of the token in the
     sorted global vocabulary. Fully engine-independent → the whole
     pipeline is DuckDB-oracle-checkable. The vocabulary is
     aggregated once (tiny: it is a vocabulary) and broadcast.
   * ``xxhash``: ids are xxhash64(token) — no vocabulary pass at all;
     the 100 TB mode (vocab could be large for noisy corpora).
3. k universal-hash functions h_j(x) = (a_j·x + b_j) mod P; MinHash
   signature = per-doc min of each h_j (one groupBy, k mins);
4. LSH banding: split the k mins into b bands of r rows; docs sharing
   any (band, band-signature) bucket are candidates. Shuffle cost is
   |docs|·b rows of (bucket → doc_id) — sub-quadratic by design;
5. verify candidates with exact token-set Jaccard (array_intersect /
   array_union on the per-doc token arrays) and keep pairs ≥ threshold.

With r rows per band the candidate curve is t ≈ (1/b)^(1/r); the
defaults (k=12, b=3, r=4) target t ≈ 0.76.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from big_data_exercise_spark.functions.text import tokens

P = 8191
# Fixed universal-hash parameters (k=12). Public textbook construction:
# h_j(x) = (A[j]*x + B[j]) mod P with odd A.
A = (3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41)
B = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def doc_token_sets(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("toks")
    )


def doc_token_ids(documents: DataFrame, use_vocab_ranks: bool = True) -> DataFrame:
    """(doc_id, tok_id) long form. vocab_rank mode joins a broadcast
    vocabulary; xxhash mode hashes inline (no extra pass)."""
    exploded = doc_token_sets(documents).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    if not use_vocab_ranks:
        # 100 TB mode: non-negative 63-bit hash, no vocab materialization.
        return exploded.select(
            "doc_id", F.abs(F.xxhash64("tok")).alias("tok_id")
        )
    vocab = (
        exploded.select("tok")
        .distinct()
        .withColumn("tok_id", F.row_number().over(W.orderBy("tok")) - 1)
    )
    # The global-order window is safe here: a vocabulary is bounded and
    # tiny relative to the corpus; at scale prefer use_vocab_ranks=False.
    return exploded.join(F.broadcast(vocab), "tok").select("doc_id", "tok_id")


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 12, use_vocab_ranks: bool = True
) -> DataFrame:
    """One row per doc: h0..h{k-1} MinHash signature columns."""
    tt = doc_token_ids(documents, use_vocab_ranks)
    mins = [
        F.min((F.lit(A[j]) * F.col("tok_id") + F.lit(B[j])) % F.lit(P)).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return tt.groupBy("doc_id").agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 12, bands: int = 3
) -> DataFrame:
    """Distinct candidate (id1 < id2) pairs sharing ≥1 LSH band bucket."""
    rows = num_hashes // bands
    pairs = []
    for b in range(bands):
        cols = [f"h{j}" for j in range(b * rows, (b + 1) * rows)]
        pairs.append(f"{b}, concat_ws('_', {', '.join(cols)})")
    stacked = signatures.selectExpr(
        "doc_id",
        f"stack({bands}, {', '.join(pairs)}) AS (band, sig)",
    )
    left = stacked.select(
        F.col("doc_id").alias("id1"), "band", "sig"
    )
    right = stacked.select(F.col("doc_id").alias("id2"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def near_duplicates(
    documents: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 12,
    bands: int = 3,
    use_vocab_ranks: bool = True,
) -> DataFrame:
    """LSH candidates verified with exact token-set Jaccard.

    Output: (id1, id2, jaccard) for verified pairs ≥ threshold.
    """
    sigs = minhash_signatures(documents, num_hashes, use_vocab_ranks)
    cand = lsh_candidate_pairs(sigs, num_hashes, bands)
    sets_ = doc_token_sets(documents)
    a = sets_.select(F.col("doc_id").alias("id1"), F.col("toks").alias("toks1"))
    b = sets_.select(F.col("doc_id").alias("id2"), F.col("toks").alias("toks2"))
    jac = F.size(F.array_intersect("toks1", "toks2")) / F.size(
        F.array_union("toks1", "toks2")
    )
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .select("id1", "id2", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
