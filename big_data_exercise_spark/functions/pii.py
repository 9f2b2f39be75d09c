"""PII detection & redaction — a first-class pass in any LLM
training-data pipeline (scrub emails/phones/SSNs/IPs before the
corpus ships). The reference has no PII layer; this extends the
engine's text-curation surface (SURVEY.md §8) the way production
corpus builds (C4, RefinedWeb, Dolma) do it: regex scrubbing as a
pure codegen stage — no UDF, no shuffle, scan→project only.

Engine notes:
* All four patterns stay inside the Java-regex ∩ RE2 common subset
  (char classes, bounded repeats, ``\\b``) so Spark and the DuckDB
  oracle match byte-for-byte; the md5 of the redacted text is the
  cross-engine witness.
* Replacement ORDER matters (an email contains an IP-like dotted
  tail; an SSN is a substring shape of some phone formats). The
  chain is email → SSN → phone → IP on both engines.
* At 100 TB this is the cheapest stage in the pipeline: one
  WholeStageCodegen span over the scan, filters/pruning unaffected,
  nothing materialized.

The synthetic `documents` corpus carries no real PII, so the query
injects DETERMINISTIC fixture PII (doc_id-derived email/SSN/phone/
IP) identically in both engines, then redacts it — the operator
under test is the scrub kernel, the injection is the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Java-regex ∩ RE2 subset — no backrefs, no lookaround.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def with_fixture_pii(documents: DataFrame) -> DataFrame:
    """Append doc_id-derived fake PII to each document (the test
    fixture; both engines build the identical string). NULL text ≡
    empty text — without the coalesce, concat NULL-poisons the whole
    dirty string and every per-doc count goes NULL (round-8 NULL-dirt
    fuzz; the oracle's _PII_DIRTY macro applies the same COALESCE)."""
    dirty = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.org ssn "),
        F.lpad((F.col("doc_id") % 900 + 100).cast("string"), 3, "0"),
        F.lit("-45-6789 call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
    )
    return documents.withColumn("dirty", dirty)


def redact_pii(documents: DataFrame) -> DataFrame:
    """Count and scrub emails/SSNs/phones/IPs per document.

    Each category is counted on the text AS THE SCRUB CHAIN SEES IT —
    emails on the dirty text, SSNs after email redaction, phones
    after SSN redaction, IPs after phone redaction — so the counts
    are exactly what the chain replaced. Counting every category
    independently on the dirty text overstates: PII nested inside an
    earlier-redacted span (an IP-like dotted tail inside an email) is
    counted but never replaced as its own category (round-6 review
    finding). Output carries the per-category hit counts, the
    redacted length, and md5 of the redacted text — if any engine
    disagrees on a single replaced byte, the hash catches it.
    """
    d = with_fixture_pii(documents)
    s1 = F.regexp_replace(F.col("dirty"), EMAIL_RE, "<EMAIL>")
    s2 = F.regexp_replace(s1, SSN_RE, "<SSN>")
    s3 = F.regexp_replace(s2, PHONE_RE, "<PHONE>")
    redacted = F.regexp_replace(s3, IP_RE, "<IP>")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("dirty"), F.lit(EMAIL_RE)).cast("long")
            .alias("n_emails"),
        F.regexp_count(s1, F.lit(SSN_RE)).cast("long")
            .alias("n_ssns"),
        F.regexp_count(s2, F.lit(PHONE_RE)).cast("long")
            .alias("n_phones"),
        F.regexp_count(s3, F.lit(IP_RE)).cast("long")
            .alias("n_ips"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_fp"),
    )


def pii_corpus_summary(documents: DataFrame) -> DataFrame:
    """Corpus-level scrub report: total hits per category and how
    many documents carried each kind — the number a data-governance
    sign-off actually reads. One partial-aggregated shuffle to a
    single row."""
    per_doc = redact_pii(documents)
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_ssns").alias("total_ssns"),
        F.sum("n_phones").alias("total_phones"),
        F.sum("n_ips").alias("total_ips"),
        F.sum((F.col("n_emails") > 0).cast("long")).alias("docs_with_email"),
        F.count_distinct("redacted_fp").alias("distinct_redacted"),
    )
