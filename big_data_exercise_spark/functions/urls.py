"""URL / registrable-domain curation operators.

Production web-corpus curation is domain-keyed: dedup rates, quality
gates and mixture weights are tracked per *registrable domain*
(example.co.uk, not blog.example.co.uk — the unit a crawler's
politeness policy, a spam list and a license audit all key on). The
reference's data model carries no URLs (its corpus analog is the
`documents` fixture), so this module derives a deterministic synthetic
URL per document from (doc_id, source, lang) — identically in Spark
and the DuckDB oracle — making the parse + rollup machinery the thing
under test, not the fixture.

Spark-first notes:

* ``parse_url`` is a built-in JVM expression (Hive semantics via
  java.net.URI): HOST strips the port and userinfo, PATH excludes the
  query string, QUERY takes a key — all whole-stage-codegen'd, no UDF.
* registrable-domain extraction uses a public-suffix-LITE rule: the
  last two labels, or the last three when the 2-label suffix is on a
  small multi-label public-suffix list (co.uk, github.io, …). The
  full Mozilla public-suffix list is ~9k rules; at production scale it
  ships as a broadcast map-side lookup table with the identical
  longest-match semantics — the rollup below is agnostic to which
  matcher fills the ``domain`` column.
* the rollup itself is ONE hash-aggregation shuffle keyed on domain
  (count / distinct-fingerprint / sum are all partially aggregable);
  the global total joins back as a broadcast 1-row aggregate, so the
  plan at 100 TB is scan → partial agg → exchange(domain) → final agg
  → broadcast join. Skewed mega-domains are exactly the AQE skew-join
  / two-level partial-agg case and need no operator change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from big_data_exercise_spark.functions.numeric import round_det, round_det_sql
from big_data_exercise_spark.functions.text import fingerprint

# doc_id % 7 picks the host: subdomains, a multi-label public suffix
# (co.uk), an apex domain, an explicit port, and a github.io page —
# the shapes a registrable-domain matcher must separate.
HOST_POOL = [
    "www.example.com",
    "blog.example.co.uk",
    "data.example.com:8080",
    "news.sample.org",
    "sample.org",
    "docs.partner.io",
    "mirror.archive.github.io",
]

# public-suffix-LITE: 2-label suffixes under which the registrable
# domain is three labels deep. Stand-in for the full PSL (see module
# docstring).
MULTI_LABEL_SUFFIXES = ["co.uk", "com.au", "co.jp", "ac.uk", "github.io"]


# URI-unreserved characters (RFC 3986 §2.3) — anything else in a
# variable URL part is substituted before construction, exactly as a
# real crawl URL constructor encodes reserved characters. Without the
# sanitize, a space (or any char java.net.URI rejects) in `source`
# makes Spark's parse_url return NULL while a string-op oracle still
# "parses" — a contract gap the round-7 hypothesis fuzz surfaced.
# Plain substitution (not %-encoding) keeps both engines trivially
# identical; the NULL-on-invalid parse_url semantics are pinned
# separately by a unit test on a raw unsanitized URL.
_UNSAFE = r"[^A-Za-z0-9._~-]"


def with_url(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic URL per document:
    https://{host_pool[doc_id % 7]}/{source}/{doc_id}?ref={lang},
    with source/lang sanitized to URI-unreserved characters."""
    host = F.element_at(
        F.array(*[F.lit(h) for h in HOST_POOL]),
        (F.col("doc_id") % 7 + 1).cast("int"),
    )
    safe = lambda c: F.regexp_replace(c, _UNSAFE, "_")  # noqa: E731
    return documents.withColumn(
        "url",
        F.concat(
            F.lit("https://"), host, F.lit("/"), safe(F.col("source")),
            F.lit("/"), F.col("doc_id").cast("string"),
            F.lit("?ref="), safe(F.col("lang")),
        ),
    )


def url_sql() -> str:
    """DuckDB twin of the synthetic-URL expression."""
    pool = ", ".join(f"'{h}'" for h in HOST_POOL)
    return (
        f"'https://' || list_extract([{pool}], "
        "CAST(doc_id % 7 + 1 AS INTEGER)) || '/' || "
        f"regexp_replace(source, '{_UNSAFE}', '_', 'g') || '/' || "
        "CAST(doc_id AS VARCHAR) || '?ref=' || "
        f"regexp_replace(lang, '{_UNSAFE}', '_', 'g')"
    )


def url_host(url: Column) -> Column:
    """HOST per Hive parse_url semantics: no scheme, no port, no
    userinfo."""
    return F.parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def url_query_param(url: Column, key: str) -> Column:
    return F.parse_url(url, F.lit("QUERY"), F.lit(key))


def registrable_domain(host: Column) -> Column:
    """Last two host labels — or three when the 2-label suffix is a
    multi-label public suffix (public-suffix-LITE; see module
    docstring). A 1- or 2-label host is its own registrable domain.
    Pure JVM expressions (split / slice / array_join): stays inside
    whole-stage codegen.

    NOTE: this builds ONE expression tree referencing ``host`` ~9
    times — fine on a materialized column, but passing a parse_url
    expression replicates the parse per reference. Pipelines should
    use :func:`with_registrable_domain` (staged single-evaluation
    projections); this form exists for unit-level semantics."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 2, host)
        .when(last2.isin(MULTI_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def registrable_domain_sql(host_expr: str) -> str:
    """DuckDB twin of :func:`registrable_domain` (1-indexed inclusive
    list slices; open-ended ``[k:]`` runs to the end)."""
    suffixes = ", ".join(f"'{sfx}'" for sfx in MULTI_LABEL_SUFFIXES)
    parts = f"str_split({host_expr}, '.')"
    return f"""
        CASE WHEN {host_expr} IS NULL THEN NULL
             WHEN len({parts}) <= 2 THEN {host_expr}
             WHEN array_to_string({parts}[len({parts}) - 1:], '.')
                  IN ({suffixes})
             THEN array_to_string({parts}[len({parts}) - 2:], '.')
             ELSE array_to_string({parts}[len({parts}) - 1:], '.')
        END"""


def with_registrable_domain(
    df: DataFrame, url_col: str = "url", out: str = "domain"
) -> DataFrame:
    """Materialize url → host → label array → domain in SEPARATE
    projections, so each expensive expression evaluates once per row.

    Passing ``registrable_domain(url_host(col))`` as one expression
    tree replicates the ``parse_url`` invoke ~9× per row (once per
    reference in the CASE — the round-6 expression-replication cost
    class; measured 10 ParseUrlEvaluator calls per row in the naive
    plan). Staged columns keep each stage single-evaluation:
    CollapseProject never merges a non-cheap expression into multiple
    downstream references (pinned at the plan level by
    test_plan_properties.test_url_parse_evaluates_once)."""
    h = df.withColumn("__host", url_host(F.col(url_col)))
    p = h.withColumn("__parts", F.split(F.col("__host"), r"\."))
    n = F.size(F.col("__parts"))
    last2 = F.array_join(F.slice(F.col("__parts"), n - 1, 2), ".")
    last3 = F.array_join(F.slice(F.col("__parts"), n - 2, 3), ".")
    domain = (
        F.when(F.col("__host").isNull(), F.lit(None).cast("string"))
        .when(n <= 2, F.col("__host"))
        .when(last2.isin(MULTI_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )
    return p.withColumn(out, domain).drop("__parts")


def url_parse_fields(documents: DataFrame) -> DataFrame:
    """Per-document URL anatomy: host, registrable domain, path, and
    the ``ref`` query parameter — the scalar parse surface
    (crawl-metadata extraction stage of a web pipeline)."""
    u = with_registrable_domain(with_url(documents))
    return u.select(
        "doc_id",
        F.col("url"),
        F.col("__host").alias("host"),
        "domain",
        url_path(F.col("url")).alias("path"),
        url_query_param(F.col("url"), "ref").alias("ref"),
    )


def domain_corpus_rollup(documents: DataFrame) -> DataFrame:
    """Per-registrable-domain curation rollup: doc count, distinct
    hosts, exact-dup count/rate (post-``dedup_exact`` fingerprints —
    the same md5 key, so 'dup' here means exactly what the dedup
    operator would drop), total chars, and the corpus mixture weight
    (the per-domain sampling prior that feeds
    ``source_mixture_sample``-style downsampling)."""
    u = with_registrable_domain(with_url(documents))
    enriched = u.select(
        "domain",
        F.col("__host").alias("host"),
        fingerprint(F.col("text")).alias("fp"),
        "n_chars",
    )
    per_dom = enriched.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("fp").alias("n_unique"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    total = documents.agg(F.count("*").alias("__tot"))
    return (
        per_dom.crossJoin(F.broadcast(total))  # 1-row aggregate: size-invariant
        .select(
            "domain",
            "n_docs",
            "n_hosts",
            (F.col("n_docs") - F.col("n_unique")).alias("n_dup_docs"),
            round_det(1 - F.col("n_unique") / F.col("n_docs"), 4).alias(
                "dup_rate"
            ),
            "n_chars_total",
            round_det(F.col("n_docs") / F.col("__tot"), 4).alias(
                "mixture_weight"
            ),
        )
    )


def domain_corpus_rollup_sql() -> str:
    """DuckDB oracle for :func:`domain_corpus_rollup`.

    NULL guards (round-8 NULL-dirt fuzz): a NULL source/lang makes the
    synthetic url NULL on both engines, but DuckDB's split_part(NULL)
    returns '' — a phantom host that COUNT(DISTINCT host) would count
    where Spark's parse_url(NULL) host is NULL and isn't; the CASE
    keeps NULL url → NULL host. The inline fingerprint coalesces like
    functions.text.fingerprint (NULL text ≡ empty doc)."""
    host = ("CASE WHEN url IS NULL THEN NULL ELSE "
            "split_part(split_part(split_part(url, '//', 2), '/', 1), ':', 1)"
            " END")
    return f"""
        WITH u AS (
          SELECT doc_id, text, n_chars, {url_sql()} AS url
          FROM documents),
        h AS (
          SELECT doc_id, text, n_chars, {host} AS host FROM u),
        d AS (
          SELECT {registrable_domain_sql("host")} AS domain, host,
                 md5(lower(trim(regexp_replace(
                     translate(COALESCE(text, ''),
                               'İΣςᲉⰯꟀꟇꟉꟋꟌꟐꟖꟘꟚꟜꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕𐵐𐵑𐵒𐵓𐵔𐵕𐵖𐵗𐵘𐵙𐵚𐵛𐵜𐵝𐵞𐵟𐵠𐵡𐵢𐵣𐵤𐵥', 'iσσᲊⱟꟁꟈꟊɤꟍꟑꟗꟙꟛƛꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼𐵰𐵱𐵲𐵳𐵴𐵵𐵶𐵷𐵸𐵹𐵺𐵻𐵼𐵽𐵾𐵿𐶀𐶁𐶂𐶃𐶄𐶅'),
                     '\\s+', ' ', 'g')))) AS fp,
                 n_chars
          FROM h),
        per AS (
          SELECT domain,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
                 CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
                 CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
          FROM d GROUP BY domain)
        SELECT domain, n_docs, n_hosts,
               n_docs - n_unique AS n_dup_docs,
               {round_det_sql("1 - n_unique / CAST(n_docs AS DOUBLE)", 4)}
                 AS dup_rate,
               n_chars_total,
               {round_det_sql("n_docs / CAST(t.tot AS DOUBLE)", 4)}
                 AS mixture_weight
        FROM per, (SELECT CAST(COUNT(*) AS BIGINT) AS tot
                   FROM documents) t
        """


def url_parse_fields_sql() -> str:
    """DuckDB oracle for :func:`url_parse_fields` (string-op parse of
    the same synthetic URLs). The scheme is stripped at the FIRST
    ``//`` via position(), never split_part: a path that itself starts
    with ``//`` (empty sanitized source) would otherwise truncate the
    parse at the second occurrence (round-7 fuzz finding #2)."""
    after_scheme = "substr(url, position('//' IN url) + 2)"
    host_port = f"split_part({after_scheme}, '/', 1)"
    host = f"split_part({host_port}, ':', 1)"
    return f"""
        WITH u AS (
          SELECT doc_id, {url_sql()} AS url FROM documents),
        f AS (
          -- NULL url → NULL host (DuckDB split_part(NULL) is '', a
          -- phantom value Spark's parse_url never produces)
          SELECT doc_id, url,
                 CASE WHEN url IS NULL THEN NULL
                      ELSE {host_port} END AS host_port,
                 CASE WHEN url IS NULL THEN NULL
                      ELSE {host} END AS host
          FROM u)
        SELECT doc_id, url, host,
               {registrable_domain_sql("host")} AS domain,
               CASE WHEN url IS NULL THEN NULL
                    ELSE substr(split_part({after_scheme}, '?', 1),
                                len(host_port) + 1) END AS path,
               CASE WHEN url IS NULL THEN NULL
                    ELSE split_part(split_part(url, 'ref=', 2), '&', 1)
               END AS ref
        FROM f
        """
