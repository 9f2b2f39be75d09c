"""End-to-end differential fuzz of documents-only oracle pairs over
RANDOM corpora — the driver-contract comparison (registry build vs
registry oracle SQL, column-sorted row-sorted md5) on inputs the
fixture never produces.

Why this lane exists: the fixture's regularity makes the contract
structurally blind to whole input classes (ASCII-safe sources, no
degenerate texts, dense doc_ids). Its FIRST run caught a real gap —
parse_url's URI-strict NULL vs the string-op oracle on a source with
a space (see PLANS.md round-7). Each example writes a tiny random
corpus as a real parquet file, points the registry build at it like
any sf_dir, and runs the query's own oracle SQL over the same file in
DuckDB.

Corpus domain kept to the documented corpus contract: printable-ASCII
text with mixed whitespace (the cross-engine lower()/length()
guarantees the oracles rely on are ASCII-scoped; Unicode casing is a
separate, documented non-goal), non-negative distinct doc_ids,
arbitrary source/lang strings (sanitization is the operators' job —
that is what the first catch was about).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from big_data_exercise_spark.plans.registry import all_queries

SPECS = all_queries()

# documents-only oracle pairs with non-trivial cross-engine formula
# surface (tokenization, n-gram algebra, percentiles, hashing, LCG
# sampling, PII regex chains, URL construction)
FUZZED = [
    "text_quality_stats",
    "repetition_stats",
    "dedup_exact",
    "token_counts",
    "corpus_language_stats",
    "dedup_stats_by_lang",
    "doc_length_bands",
    "data_card_report",
    "clean_text_stats",
    "ngram_novelty",
    "idf_top_terms",
    "token_packing",
    "document_chunks",
    "explode_words",
    "source_mixture_sample",
    "url_parse_fields",
    "domain_corpus_rollup",
    "utf8_decode_accounting",
]

_WORD = st.sampled_from(
    ["the", "a", "and", "of", "alpha", "Beta", "x", "LONGWORD", "a.b,c!", ""]
)
_SEP = st.sampled_from([" ", "  ", "\t", "\n", " \t\n"])
_TEXT = st.lists(st.tuples(_WORD, _SEP), min_size=0, max_size=10).map(
    lambda ps: "".join(w + s for w, s in ps)
)
_DOC = st.tuples(
    st.integers(min_value=0, max_value=10**12),
    _TEXT,
    st.sampled_from(["src0", "src7", "weird src", "", "ünïcode"]),
    st.sampled_from(["en", "de", "zh", "xx", ""]),
    st.integers(min_value=0, max_value=5000),
)


def _vhash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def _write_corpus(rows) -> str:
    d = tempfile.mkdtemp(prefix="bdes_fuzz_")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", FUZZED)
def test_oracle_pair_random_corpus(spark, name):
    spec = SPECS[name]

    @settings(max_examples=5, deadline=None)
    @given(rows=st.lists(_DOC, min_size=1, max_size=10, unique_by=lambda r: r[0]))
    def run(rows):
        sf_dir = _write_corpus(rows)
        got = spec.build(spark, sf_dir).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}'"
        )
        want = con.sql(spec.oracle).df()
        con.close()
        assert sorted(got.columns) == sorted(want.columns), name
        assert len(got) == len(want), (name, len(got), len(want), rows)
        assert _vhash(got) == _vhash(want), f"{name} diverged on {rows}"

    run()
