"""Unit/property lanes for the URL/domain curation tier and the
dirty-encoding ingest operator (round-7 additions; the registry
entries themselves ride the oracle-parity gate like every query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_exercise_spark.functions import urls
from big_data_exercise_spark.sources import encoding


# --- registrable domain --------------------------------------------------

@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("blog.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),       # exactly 3 labels, PSL hit
        ("deep.sub.blog.example.co.uk", "example.co.uk"),
        ("mirror.archive.github.io", "archive.github.io"),
        ("sample.org", "sample.org"),
        ("localhost", "localhost"),               # 1 label: itself
        ("a.b.c.d.example.com", "example.com"),
        (None, None),
    ],
)
def test_registrable_domain(spark, host, expected):
    df = spark.createDataFrame([(host,)], "host string")
    out = df.select(urls.registrable_domain(F.col("host")).alias("d")).collect()
    assert out[0]["d"] == expected


def test_registrable_domain_sql_twin(spark):
    """Spark expr and DuckDB twin agree label-for-label on the unit
    host set (the oracle-parity gate only sees the 7 fixture hosts)."""
    import duckdb

    hosts = [
        "www.example.com", "example.com", "blog.example.co.uk",
        "example.co.uk", "deep.sub.blog.example.co.uk",
        "mirror.archive.github.io", "sample.org", "localhost",
        "a.b.c.d.example.com", "x.ac.uk", "y.com.au", "z.co.jp",
    ]
    sdf = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["d"]
        for r in sdf.select(
            "host", urls.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    duck = duckdb.sql(
        "SELECT host, "
        + urls.registrable_domain_sql("host")
        + " AS d FROM (SELECT unnest(?::VARCHAR[]) AS host)",
        params=[hosts],
    ).df()
    want = dict(zip(duck["host"], duck["d"]))
    assert got == want


def test_registrable_domain_hypothesis_fuzz(spark):
    """Property sweep of the registrable-domain rule over arbitrary
    host shapes — random label alphabets, depths 1-6, including labels
    that collide with the multi-label suffix list — Spark expression
    vs the DuckDB SQL twin must agree on every host. One batched
    Spark/DuckDB round-trip per example set keeps the lane cheap."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    label = st.sampled_from(
        ["a", "bb", "co", "uk", "com", "au", "github", "io", "x1", "ac"]
    )
    host = st.lists(label, min_size=1, max_size=6).map(".".join)

    @settings(derandomize=True, max_examples=20, deadline=None)
    @given(hosts=st.lists(host, min_size=1, max_size=25))
    def run(hosts):
        sdf = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = [
            (r["host"], r["d"])
            for r in sdf.select(
                "host", urls.registrable_domain(F.col("host")).alias("d")
            ).collect()
        ]
        duck = duckdb.sql(
            "SELECT host, "
            + urls.registrable_domain_sql("host")
            + " AS d FROM (SELECT unnest(?::VARCHAR[]) AS host)",
            params=[hosts],
        ).df()
        want = list(zip(duck["host"], duck["d"]))
        assert sorted(got) == sorted(want)

    run()


def test_parse_url_port_and_query(spark):
    """Hive parse_url semantics the oracle's string ops must mirror:
    HOST strips the port, PATH excludes the query, QUERY takes a key."""
    df = spark.createDataFrame(
        [("https://data.example.com:8080/src3/10?ref=zh&x=1",)], "url string"
    )
    row = df.select(
        urls.url_host(F.col("url")).alias("h"),
        urls.url_path(F.col("url")).alias("p"),
        urls.url_query_param(F.col("url"), "ref").alias("r"),
        urls.url_query_param(F.col("url"), "missing").alias("m"),
    ).collect()[0]
    assert row["h"] == "data.example.com"
    assert row["p"] == "/src3/10"
    assert row["r"] == "zh"
    assert row["m"] is None


def test_parse_url_invalid_uri_yields_null(spark):
    """parse_url is java.net.URI-strict: a URL carrying a raw space
    (or any rejected character) parses to NULL in EVERY field — the
    dirty-crawl degradation path. The synthetic-URL builders sanitize
    their variable parts so the registry oracle never meets this case
    (the string-op oracle would 'parse' it anyway — the contract gap
    the round-7 fuzz caught); this lane pins the raw behavior."""
    df = spark.createDataFrame(
        [("https://www.example.com/weird src/0?ref=en",)], "url string"
    )
    row = df.select(
        urls.url_host(F.col("url")).alias("h"),
        urls.url_path(F.col("url")).alias("p"),
        urls.url_query_param(F.col("url"), "ref").alias("r"),
    ).collect()[0]
    assert row["h"] is None and row["p"] is None and row["r"] is None


def test_with_url_sanitizes_variable_parts(spark):
    """Dirty source/lang values reach the URL as URI-unreserved
    substitutions, so the constructed URL always parses."""
    docs = spark.createDataFrame(
        [(3, "text", "weird src/β?", "e n", 4)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    row = urls.url_parse_fields(docs).collect()[0]
    assert row["url"] == "https://news.sample.org/weird_src___/3?ref=e_n"
    assert row["host"] == "news.sample.org"
    assert row["path"] == "/weird_src___/3"
    assert row["ref"] == "e_n"


def test_domain_rollup_counts_planted_dups(spark):
    """Planted exact duplicates (whitespace variants — the dedup_exact
    key is whitespace-normalized) show up in the right domain's
    n_dup_docs; mixture weights sum to ~1."""
    rows = [
        # doc_id % 7 == 0 -> www.example.com -> example.com
        (0, "same doc text", "src0", "en", 13),
        (7, "same  doc\ttext", "src0", "en", 14),     # ws variant: dup
        (14, "other text", "src1", "en", 10),
        # doc_id % 7 == 4 -> sample.org
        (4, "unique over here", "src2", "de", 16),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = {r["domain"]: r for r in urls.domain_corpus_rollup(docs).collect()}
    assert out["example.com"]["n_docs"] == 3
    assert out["example.com"]["n_dup_docs"] == 1
    assert out["sample.org"]["n_docs"] == 1
    assert out["sample.org"]["n_dup_docs"] == 0
    assert abs(sum(r["mixture_weight"] for r in out.values()) - 1.0) < 1e-6


def test_new_oracle_pairs_hypothesis_fuzz(spark):
    """End-to-end differential fuzz of the two round-7 oracle pairs:
    a RANDOM documents corpus (ASCII words, mixed whitespace,
    arbitrary non-negative doc_ids) runs through the Spark operator
    AND its DuckDB oracle SQL over the identical frame — the same
    comparison as the driver contract, on inputs the fixture never
    produces (degenerate texts, duplicate texts across domains,
    sparse/colliding ids)."""
    import duckdb
    import hashlib
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from big_data_exercise_spark.sources import encoding as enc

    word = st.sampled_from(
        ["alpha", "beta", "Gamma", "the", "a", "x", "LONGERWORD", ""]
    )
    sep = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
    text = st.lists(st.tuples(word, sep), min_size=0, max_size=8).map(
        lambda ps: "".join(w + s for w, s in ps)
    )
    doc = st.tuples(
        st.integers(min_value=0, max_value=10**12),  # doc_id
        text,
        st.sampled_from(["src0", "src7", "weird src", "", "A/B?x=1", "ünïcode"]),
        st.sampled_from(["en", "de", "zh", "e n", ""]),
        st.integers(min_value=0, max_value=5000),    # n_chars
    )

    def vhash(pdf):
        pdf = pdf[sorted(pdf.columns)]
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
        return hashlib.md5(
            pdf.to_csv(index=False, float_format="%.9g").encode()
        ).hexdigest()

    @settings(derandomize=True, max_examples=12, deadline=None)
    @given(rows=st.lists(doc, min_size=1, max_size=12, unique_by=lambda r: r[0]))
    def run(rows):
        sdf = spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string, n_chars long"
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                rows, columns=["doc_id", "text", "source", "lang", "n_chars"]
            ),
        )
        for build, sql in (
            (urls.domain_corpus_rollup, urls.domain_corpus_rollup_sql()),
            (enc.utf8_decode_accounting, enc.utf8_decode_accounting_sql()),
        ):
            got = build(sdf).toPandas()
            want = con.sql(sql).df()
            assert sorted(got.columns) == sorted(want.columns)
            assert vhash(got) == vhash(want), (
                f"{build.__name__} diverged on {rows}"
            )
        con.close()

    run()


# --- UTF-8 replacement decode --------------------------------------------

@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"plain ascii",
        "déjà vu — 漢字 €".encode(),
        b"stray tail \xe9",
        b"truncated \xe2\x82",
        b"mid \xff\xfe stream",
        b"\x80\x80\x80",                       # 3 lone continuation bytes
        b"overlong \xc0\xaf",                  # overlong encoding: 2 repl
        b"good \xe2\x82\xac then bad \xe2\x82",  # valid EUR then truncated
        b"\xf0\x9f\x98\x80 emoji ok",
    ],
)
def test_decode_matches_python_replace(spark, raw):
    """The operator's (text, n_replacements) equals CPython's
    'replace' handler output — maximal-subpart substitution."""
    expected = raw.decode("utf-8", "replace")
    df = spark.createDataFrame([(bytearray(raw),)], "raw binary")
    row = df.select(encoding.decode_utf8(F.col("raw")).alias("d")).collect()[0]["d"]
    assert row["text"] == expected
    assert row["n_replacements"] == expected.count(encoding.REPLACEMENT)


def test_decode_counts_only_introduced_replacements(spark):
    """A literal U+FFFD already present in the source bytes (the valid
    sequence EF BF BD) must NOT count as a replacement — the counting
    error handler fires only on undecodable maximal subparts, where
    the former output-scan count inflated (round-8 advice). Includes
    the boundary case of a lone lead byte directly followed by a
    literal U+FFFD."""
    cases = [
        ("lit�eral".encode(), 0, "lit�eral"),
        ("a�b".encode() + b"\xe9", 1, "a�b�"),
        (b"\xf0\xef\xbf\xbd", 1, "��"),
        ("��".encode(), 0, "��"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(raw)) for i, (raw, _, _) in enumerate(cases)],
        "i int, raw binary",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", encoding.decode_utf8(F.col("raw")).alias("d")
        ).collect()
    }
    for i, (_, want_n, want_text) in enumerate(cases):
        assert got[i]["text"] == want_text, i
        assert got[i]["n_replacements"] == want_n, i


def test_decode_null_row(spark):
    df = spark.createDataFrame([(None,)], "raw binary")
    row = df.select(encoding.decode_utf8(F.col("raw")).alias("d")).collect()[0]["d"]
    assert row["text"] is None and row["n_replacements"] is None


def test_fixture_corpus_is_replacement_free(spark):
    """The oracle's analytic reconstruction assumes the corpus carries
    no literal U+FFFD (else planted counts would over-count); pin it."""
    from big_data_exercise_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.filter(F.col("text").contains(encoding.REPLACEMENT)).count()
    assert n == 0


def test_planted_classes_round_trip(spark):
    """End-to-end accounting over a tiny corpus: every planted class
    yields exactly its documented replacement count, and n_bytes /
    n_chars close the arithmetic the oracle uses."""
    rows = [(i, f"text number {i}", "s", "en", 14) for i in range(14)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    out = {r["doc_id"]: r for r in encoding.utf8_decode_accounting(docs).collect()}
    for i, text in [(r[0], r[1]) for r in rows]:
        m = i % 7
        want_repl = {1: 1, 3: 1, 5: 2}.get(m, 0)
        r = out[i]
        assert r["n_replacements"] == want_repl, (i, r)
        assert r["valid_utf8"] == (want_repl == 0)
        extra_bytes = {1: 1, 3: 2, 5: 7}.get(m, 0)
        assert r["n_bytes"] == len(text.encode()) + extra_bytes
        extra_chars = {1: 1, 3: 1, 5: 7}.get(m, 0)
        assert r["n_chars"] == len(text) + extra_chars
