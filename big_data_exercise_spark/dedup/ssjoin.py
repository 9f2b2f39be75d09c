"""Exact set-similarity self-join via prefix filtering (SSJoin /
PPJoin-lite; Chaudhuri et al. ICDE'06, Xiao et al. WWW'08).

The EXACT counterpart to MinHash-LSH: zero recall loss at sub-quadratic
cost. With every document's token set sorted by one global order, two
sets with Jaccard ≥ t MUST share a token inside each other's first
⌊(1−t)·|set|⌋+1 tokens (pigeonhole on the required overlap) — so only
docs sharing a PREFIX token are candidates, and verification is exact.
Sorting the global order by ascending document frequency puts the
RAREST tokens in prefixes, which is what makes candidate lists small:
a token appearing in two docs produces one candidate pair, a stopword
never enters a prefix.

Scale shape (100 TB):
* the global order is (df, token) — computed with one groupBy, never a
  global rank window; each doc sorts ITS OWN tokens by that key with a
  partition-local ``sort_array`` (no shuffle);
* the candidate join is bucketed on prefix tokens — bucket sizes are
  bounded by construction (rare tokens), the anti-skew property LSH
  bands need capping to get;
* verification is the same sorted-int-array intersect DISCIPLINE as
  the MinHash verifier (size-ratio prefilter, hashed token ids) —
  one shared copy inside this module (:func:`_verified`) serves both
  the self-join and incremental variants.

Unlike LSH this is exact — the output provably equals the brute-force
all-pairs join, which is precisely what the DuckDB oracle computes.

Measured selectivity caveat (honest scale analysis): prefix filtering
needs a Zipfian vocabulary where a document's rarest tokens are
actually rare. On the synthetic fixture corpus (tiny template
vocabulary, ~21 distinct tokens/doc, even the rarest token of a doc
shared by ~75% of docs, and 24% of ALL pairs genuinely ≥ 0.8 Jaccard)
candidate precision is ~25% and the verify stage must process ~12M
pairs at sf0.1 — the information-theoretic floor is ~3M true pairs, so
no exact method is cheap here. On a real web corpus the df-ascending
prefix is selective by construction; the escalation path when it is
not: exact-duplicate collapse first (as minhash.near_duplicates does),
then positional filtering (full PPJoin) to tighten the overlap bound
per candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_exercise_spark.dedup.minhash import doc_token_sets
from big_data_exercise_spark.functions.numeric import round_det_nn


def _exploded_tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, tok) rows, localCheckpointed: feeds the df aggregate,
    the prefix derivation AND the verify-set build."""
    from big_data_exercise_spark.tables import ensure_parallelism

    return (
        ensure_parallelism(documents)
        .transform(doc_token_sets)
        .select("doc_id", F.explode("toks").alias("tok"))
        .localCheckpoint(eager=False)
    )


def _prefix_table(toks: DataFrame, threshold: float) -> DataFrame:
    """(doc_id, tok) PREFIX rows under the df-ascending global token
    order, localCheckpointed because it feeds both sides of the
    candidate join (Spark has no cross-DAG CSE: unpinned, the full-
    corpus df join + collect_list aggregation would execute once per
    side — the recompute class minhash.py:209 documents and measures).

    Global token order: ascending document frequency, token string as
    the deterministic tie-break. One aggregation — no global rank.
    Prefix length sz − ⌈t·sz⌉ + 1: any partner with J ≥ t must share
    a token in this prefix (standard prefix-filter bound for
    Jaccard).  Computed FLOAT-SAFELY: the algebraically equal
    ⌊(1−t)·sz⌋+1 under-counts by one whenever (1−t) rounds down in
    IEEE (1−0.8 = 0.19999…96, so sz=20 gives ⌊3.9999…⌋+1 = 4, not
    the required 5) and a pair at exactly J = t escapes candidate
    generation.  The epsilon biases ⌈⌉ DOWN, which can only LENGTHEN
    the prefix — a superset of candidates is always safe because
    verification is exact."""
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    keyed = toks.join(df_counts, "tok").select(
        "doc_id", F.struct(F.col("df"), F.col("tok")).alias("key")
    )
    per_doc = keyed.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("key")).alias("sorted_keys"),
        F.count("*").alias("sz"),
    )
    prefix_len = (
        F.col("sz")
        - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    return (
        per_doc.select(
            "doc_id",
            F.explode(F.slice("sorted_keys", 1, prefix_len)).alias("p"),
        )
        .select("doc_id", F.col("p.tok").alias("tok"))
        .localCheckpoint(eager=False)
    )


def _hashed_sets(toks: DataFrame) -> DataFrame:
    """(doc_id, sorted int-token-id array, size) verify table,
    localCheckpointed because it feeds both verify joins. |A∩B| is
    invariant under any injective token→id mapping, so hashing tokens
    to 63-bit ids changes nothing about the counts (collision odds
    ~|vocab|²/2⁶⁴ — vanishing; the oracle's string-based brute force
    would catch one) while making the per-pair intersect ~an order of
    magnitude cheaper than string arrays — the same discipline as the
    MinHash verifier."""
    return (
        # & MAX_LONG, not abs(): abs(Long.MIN_VALUE) throws under ANSI
        # mode (Spark 4 default); same 2-preimage collision profile.
        toks.select(
            "doc_id",
            F.xxhash64("tok").bitwiseAND(F.lit((1 << 63) - 1)).alias("tok_id"),
        )
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_set("tok_id")).alias("toks"),
            F.count_distinct("tok_id").alias("sz"),
        )
        .localCheckpoint(eager=False)
    )


def _verified(
    cand: DataFrame,
    sets: DataFrame,
    left: str,
    right: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair list against the
    hashed verify table — THE one copy of the verify semantics
    (size-ratio prefilter, sorted-array intersect, deterministic
    rounding) shared by the self-join and incremental variants."""
    a = sets.select(
        F.col("doc_id").alias(left),
        F.col("toks").alias("toks1"),
        F.col("sz").alias("sz1"),
    )
    b = sets.select(
        F.col("doc_id").alias(right),
        F.col("toks").alias("toks2"),
        F.col("sz").alias("sz2"),
    )
    # J >= t implies min(sz)/max(sz) >= t: kill size-skewed pairs with
    # two int compares before the O(sz) intersect.
    ratio_ok = (F.col("sz1") >= F.col("sz2") * threshold) & (
        F.col("sz2") >= F.col("sz1") * threshold
    )
    # Materialize the O(sz) intersect in its own projection: the raw
    # threshold filter plus round_det's ~6 argument references would
    # otherwise re-run array_intersect per reference (a non-cheap
    # alias referenced more than once is never inlined by
    # CollapseProject). Semantics unchanged: filter on the RAW
    # jaccard, round only for output — same as before.
    jac = F.col("__inter") / (F.col("sz1") + F.col("sz2") - F.col("__inter"))
    return (
        cand.join(a, left)
        .join(b, right)
        .filter(ratio_ok)
        .select(
            left,
            right,
            "sz1",
            "sz2",
            F.size(F.array_intersect("toks1", "toks2")).alias("__inter"),
        )
        .filter(jac >= threshold)
        .select(left, right, round_det_nn(jac, 4).alias("jaccard"))
    )


def exact_jaccard_pairs(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """All pairs with token-set Jaccard ≥ ``threshold`` — exact.

    Output: (id1 < id2, jaccard rounded to 4) — identical to the
    brute-force all-pairs join (the oracle), at prefix-filter cost.
    """
    toks = _exploded_tokens(documents)
    prefixes = _prefix_table(toks, threshold)
    cand = (
        prefixes.select(F.col("doc_id").alias("id1"), "tok")
        .join(prefixes.select(F.col("doc_id").alias("id2"), "tok"), "tok")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    return _verified(cand, _hashed_sets(toks), "id1", "id2", threshold)


def incremental_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.8, new_mod: int = 10
) -> DataFrame:
    """Incremental-ingestion dedup: which docs of a NEW batch
    (doc_id % ``new_mod`` == 0 — the deterministic stand-in for
    "today's crawl") are near-duplicates of the EXISTING corpus.
    This asymmetric shape is what a production pipeline actually runs
    daily — re-deduping the full corpus on every ingest is the O(N²)
    bill the incremental form exists to avoid.

    Same exact prefix-filter machinery as :func:`exact_jaccard_pairs`
    (document frequencies still computed over the FULL collection, so
    both sides order tokens identically — a per-batch vocabulary
    would break the shared prefix bound), but candidates come only
    from the cross-side join new-prefix × corpus-prefix: the
    corpus × corpus quadrant — the overwhelming bulk at 100 TB —
    is never generated.  Verification is exact, so the brute-force
    new × corpus join is the oracle and equality proves zero recall
    loss.

    Output: (new_id, corpus_id, jaccard ≥ threshold rounded 4).
    """
    is_new = F.col("doc_id") % new_mod == 0
    toks = _exploded_tokens(documents)
    prefixes = _prefix_table(toks, threshold)
    cand = (
        prefixes.filter(is_new)
        .select(F.col("doc_id").alias("new_id"), "tok")
        .join(
            prefixes.filter(~is_new).select(
                F.col("doc_id").alias("corpus_id"), "tok"
            ),
            "tok",
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    return _verified(cand, _hashed_sets(toks), "new_id", "corpus_id", threshold)
