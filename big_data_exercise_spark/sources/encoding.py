"""Dirty-encoding ingest: bytes → text decode with replacement
accounting.

The first stage of any crawl pipeline is byte-stream → text: real
corpora arrive with stray latin-1 bytes, truncated multibyte
sequences and binary garbage embedded in nominally-UTF-8 payloads.
The standard recovery is replacement decoding (each undecodable
maximal subpart becomes U+FFFD, RFC 3629 / Unicode §3.9 "U+FFFD
substitution of maximal subparts") — but silently swallowing the
replacements hides data-quality regressions, so the operator ships
the count alongside the text: downstream gates filter or re-route on
``n_replacements`` exactly like `corrupt_record_accounting` does for
malformed JSON/CSV rows.

Spark-first shape: the byte column stays opaque binary through the
scan; the decode is ONE Arrow-batched pandas_udf returning a struct
(text, n_replacements) — bytes cross to Python once per batch, all
derived metrics (byte length, char length, validity flag) are JVM
expressions over the struct. At 100 TB this is an embarrassingly
parallel map stage: no shuffle, no state, prunable columns.

The registry fixture plants corruption deterministically on the
documents corpus (doc_id mod 7 selects the class: clean / stray
latin-1 tail byte / truncated 3-byte prefix / two invalid bytes
mid-stream), so the DuckDB oracle can reconstruct the expected
decoded text and counts exactly (text || chr(65533)…) — the decode
itself is what's under test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

REPLACEMENT = "�"

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("n_replacements", T.IntegerType()),
    ]
)


# Counting variant of the 'replace' decode-error handler: CPython's
# UTF-8 decoder invokes the handler once per undecodable maximal
# subpart (Unicode §3.9), so incrementing per invocation counts
# replacements INTRODUCED by the decode exactly — a literal U+FFFD
# already present in the source bytes (the valid sequence EF BF BD)
# never reaches the handler and is not counted (round-8 advice; the
# previous output-scan count inflated on such inputs). Both the
# handler and its counter are LOCALS of the UDF invocation, and the
# registration happens per batch: cloudpickle ships the UDF by value,
# so module-level state splits into one cell per pickle copy while
# codecs' registry is process-global — a module-level counter ends up
# incremented by one copy and read by another (observed: all counts
# 0 under worker reuse). A per-call closure cannot alias.
@F.pandas_udf(_DECODE_SCHEMA)
def _decode_replace(data: pd.Series) -> pd.DataFrame:
    import codecs

    n = [0]

    def counting_replace(exc):
        n[0] += 1
        return (REPLACEMENT, exc.end)

    codecs.register_error("bde_count_replace", counting_replace)
    texts, counts = [], []
    for raw in data:
        if raw is None:
            texts.append(None)
            counts.append(None)
            continue
        n[0] = 0
        decoded = bytes(raw).decode("utf-8", "bde_count_replace")
        texts.append(decoded)
        counts.append(n[0])
    return pd.DataFrame({"text": texts, "n_replacements": counts})


def decode_utf8(raw: Column) -> Column:
    """binary → struct(text, n_replacements): UTF-8 replacement decode
    with accounting. One Arrow batch round-trip; see module docstring."""
    return _decode_replace(raw)


def planted_corrupt_bytes(documents: DataFrame) -> DataFrame:
    """Deterministic dirty-bytes fixture over the documents corpus:
    UTF-8-encode each text and plant per-class corruption by
    doc_id mod 7 (JVM-side encode + binary concat — no UDF):

    * mod 1 → + ``0xE9`` (stray latin-1 byte, 1 replacement)
    * mod 3 → + ``0xE2 0x82`` (truncated 3-byte prefix, 1 replacement
      — maximal-subpart consumption, not one per byte)
    * mod 5 → + ``0xFF 0xFE`` + `` tail`` (two invalid bytes
      mid-stream, 2 replacements, decoding resumes after)
    * otherwise clean (0 replacements)
    """
    # NULL text ≡ empty text (no-content doc): the planted corrupt
    # tail still applies, so a NULL-text doc with doc_id%7==1 is one
    # invalid byte, one replacement — deterministic on both engines
    # (round-8 NULL-dirt fuzz finding).
    enc = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    m = F.col("doc_id") % 7
    raw = (
        F.when(m == 1, F.concat(enc, F.lit(bytearray(b"\xe9"))))
        .when(m == 3, F.concat(enc, F.lit(bytearray(b"\xe2\x82"))))
        .when(m == 5, F.concat(enc, F.lit(bytearray(b"\xff\xfe tail"))))
        .otherwise(enc)
    )
    return documents.select("doc_id", raw.alias("raw"))


def utf8_decode_accounting(documents: DataFrame) -> DataFrame:
    """The registry query: planted dirty bytes → replacement decode →
    per-document accounting row (decoded text, byte length, char
    length, replacement count, validity flag)."""
    d = planted_corrupt_bytes(documents).select(
        "doc_id",
        F.length("raw").alias("n_bytes"),
        decode_utf8(F.col("raw")).alias("dec"),
    )
    return d.select(
        "doc_id",
        "n_bytes",
        F.col("dec.text").alias("decoded"),
        F.length("dec.text").alias("n_chars"),
        F.col("dec.n_replacements").alias("n_replacements"),
        (F.col("dec.n_replacements") == 0).alias("valid_utf8"),
    )


def utf8_decode_accounting_sql() -> str:
    """DuckDB oracle: reconstruct the expected decode analytically
    from the planting rule (chr(65533) = U+FFFD). ``strlen`` is byte
    length, ``length`` char length; the fixture corpus is
    U+FFFD-free (pinned by the property test)."""
    return """
        WITH t AS (SELECT doc_id, COALESCE(text, '') AS text
                   FROM documents)
        SELECT doc_id,
               CAST(strlen(text) + CASE doc_id % 7
                      WHEN 1 THEN 1 WHEN 3 THEN 2 WHEN 5 THEN 7
                      ELSE 0 END AS INTEGER) AS n_bytes,
               CASE doc_id % 7
                 WHEN 1 THEN text || chr(65533)
                 WHEN 3 THEN text || chr(65533)
                 WHEN 5 THEN text || chr(65533) || chr(65533) || ' tail'
                 ELSE text END AS decoded,
               CAST(length(text) + CASE doc_id % 7
                      WHEN 1 THEN 1 WHEN 3 THEN 1 WHEN 5 THEN 7
                      ELSE 0 END AS INTEGER) AS n_chars,
               CAST(CASE doc_id % 7 WHEN 1 THEN 1 WHEN 3 THEN 1
                      WHEN 5 THEN 2 ELSE 0 END AS INTEGER)
                 AS n_replacements,
               (doc_id % 7 NOT IN (1, 3, 5)) AS valid_utf8
        FROM t
        """
