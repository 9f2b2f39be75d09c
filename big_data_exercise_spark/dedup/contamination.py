"""Benchmark-contamination detection — the train/test-overlap scan
every serious LLM corpus build runs (GPT-3 §C, PaLM §8, The Pile):
does a training document contain verbatim n-grams from an eval set?

Spark-first shape:
* Both sides reduce to DISTINCT word-``n``-gram hashes (md5 of the
  joined words — md5 exists in Spark AND DuckDB, so the oracle
  matches exactly; production would swap xxhash64 for speed, same
  plan shape).
* The benchmark side is tiny by construction (eval sets are KBs
  against a 100 TB corpus) → its distinct hash set BROADCASTs, and
  the contamination probe is a broadcast LEFT SEMI join per gram —
  the corpus never shuffles.
* Per-doc rates come from one partial-aggregated groupBy(doc_id):
  gram explosion → semi-probe → count, all in one stage chain.

The n-gram builder is pure Column algebra (split → transform over a
sequence → slice/concat_ws → md5 → explode): no UDF, stays inside
WholeStageCodegen until the explode.

Fixture: the driver testdata has no separate eval table, so the
"benchmark" is the deterministic slice ``doc_id % 97 == 0`` of the
same corpus (self-matches excluded by construction because benchmark
docs are removed from the probe side). Published decontamination uses
8-13-gram windows; this synthetic corpus duplicates by word-level
resampling (no long verbatim runs survive), so the default here is
``n=4`` — the plan is n-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from big_data_exercise_spark.functions.numeric import round_det

# The deterministic benchmark slice (doc_id % BENCH_MODULUS == 0).
# ONE constant: governed_corpus's "is_benchmark" gate and this
# module's probe split must derive from the same modulus or the two
# gates silently desynchronize (round-6 review finding).
BENCH_MODULUS = 97


def _gram_hashes(w: Column, n: int) -> Column:
    """DISTINCT md5 hashes of word n-grams over a MATERIALIZED token
    array column ``w``.

    ``w`` must be an attribute reference (a column aliased in its own
    projection), never the ``split(...)`` expression itself: an
    expression captured in a transform lambda is re-evaluated PER
    ELEMENT, so split-inside-the-lambda re-tokenizes the document once
    per n-gram position — O(len²) per doc. Invisible on ~KB rows; on
    the round-9 skewed corpus one 10 MB document pinned a core for
    >10 minutes (≈10¹² char ops). With ``w`` bound, each gram is a
    4-element slice copy — linear overall. Same discipline as
    winnow.fingerprint_sets_relational's pre-split char array."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + 1, n))),
    )
    return F.array_distinct(grams)


def contamination_report(
    documents: DataFrame,
    n: int = 4,
    bench_modulus: int = BENCH_MODULUS,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination: how many of a doc's distinct
    n-grams appear verbatim in the benchmark slice.

    Returns docs with ≥ ``min_hits`` contaminated grams, with the
    contaminated fraction rounded deterministically (4 dp).
    """
    # split ONCE into its own projection; __w is multi-referenced
    # (filter size + sequence bound + slice) so CollapseProject never
    # inlines the split back into the gram lambda
    toks = documents.select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("__w")
    ).filter(F.size("__w") >= n)
    hashed = toks.select(
        "doc_id", F.explode(_gram_hashes(F.col("__w"), n)).alias("gh")
    )
    bench = (
        hashed.filter(F.col("doc_id") % bench_modulus == 0)
        .select("gh").distinct()
    )
    probe = hashed.filter(F.col("doc_id") % bench_modulus != 0)
    # ONE pass over the probe side: a broadcast LEFT join with a hit
    # marker counts total grams and contaminated grams in the same
    # aggregate. The previous two-aggregate formulation scanned and
    # re-tokenized the full corpus twice AND inner-joined the counts,
    # which dropped zero-hit docs before the min_hits filter could see
    # them — min_hits=0 ("report every probe doc") silently behaved as
    # min_hits=1 (round-6 review finding). Probe grams are distinct
    # per doc and bench grams are distinct, so the join never fans out.
    scored = (
        probe.join(
            F.broadcast(bench.withColumn("hit", F.lit(1))), "gh", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
    )
    return (
        scored.filter(F.col("n_contaminated") >= min_hits)
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            round_det(
                F.col("n_contaminated") / F.col("n_grams"), 4
            ).alias("contamination_rate"),
        )
    )


def contamination_summary(
    documents: DataFrame, n: int = 4, bench_modulus: int = BENCH_MODULUS,
    quarantine_rate: float = 0.5,
) -> DataFrame:
    """Corpus-level decontamination report: docs scanned, docs
    touched, docs a pipeline would QUARANTINE (rate ≥ threshold) —
    the actionable output (drop list size) of the scan."""
    rep = contamination_report(documents, n=n, bench_modulus=bench_modulus)
    return rep.agg(
        F.count("*").alias("docs_contaminated"),
        F.sum("n_contaminated").alias("total_hits"),
        F.sum(
            (F.col("contamination_rate") >= quarantine_rate).cast("long")
        ).alias("docs_quarantined"),
        round_det(F.max("contamination_rate"), 4).alias("max_rate"),
    )
