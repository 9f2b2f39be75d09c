"""Scalar expression operators: projections, casts, JSON, regex,
conditionals, sampling (SURVEY.md §2.2, §2.6, §2.9).

Reference occurrences re-expressed here:
* P2 from_json with explicit schema — consumer_postgres_streaming.py:400,
  vehicle_consumer.py:59;
* P5 regexp_extract — consumer_postgres_streaming.py:392-393;
* P7 epoch→timestamp — vehicle_consumer.py:179;
* P8/P9 round/length/CASE WHEN — fire_detection_app.py:40-41,67,128;
* O2 sampling — streamlit_app.py:42 (ORDER BY RANDOM() LIMIT 300); the
  engine's deterministic, cluster-reproducible form is systematic
  (key-modulo) sampling, plus seeded F.rand for statistical sampling.

All expressions are built-in Column functions → whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


def json_props_stats(events: DataFrame) -> DataFrame:
    """Parse the JSON ``props`` payload with an explicit schema (the
    reference's from_json pattern, P2) and aggregate the extracted
    field. Explicit schema = no sampling pass, vectorized JSON parse.
    """
    from big_data_exercise_spark.functions.numeric import round_det

    parsed = events.select(
        "event_type", F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k")
    )
    return parsed.groupBy("event_type").agg(
        round_det(F.avg("k"), 2).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.count(F.col("k")).alias("n_k"),
    )


def regex_keyword_hits(documents: DataFrame) -> DataFrame:
    """regexp_extract keyword tagging (P5): first engine keyword in
    each doc; counts per (lang, keyword)."""
    kw = F.regexp_extract(F.col("text"), r"\b(spark|join|merge|stream)\b", 1)
    return (
        documents.select("lang", kw.alias("keyword"))
        .filter(F.col("keyword") != "")
        .groupBy("lang", "keyword")
        .agg(F.count("*").alias("n"))
    )


def scalar_projection(documents: DataFrame) -> DataFrame:
    """Per-row scalar expression suite: length / round / upper /
    substring / CASE WHEN (P8, P9) in one codegen stage."""
    from big_data_exercise_spark.functions.numeric import round_det

    return documents.select(
        "doc_id",
        F.length(F.col("text")).alias("len_chars"),
        round_det(F.col("n_chars") / 100.0, 2).alias("hecto_chars"),
        F.upper(F.col("lang")).alias("lang_uc"),
        F.substring(F.col("text"), 1, 10).alias("prefix10"),
        F.when(F.col("n_chars") > 300, F.lit("long")).otherwise(F.lit("short")).alias("size_class"),
    )


def epoch_roundtrip(events: DataFrame) -> DataFrame:
    """Epoch↔timestamp conversion (P7): to epoch ms and back, plus
    date_trunc — exact integer round-trip, engine-independent."""
    ts_ms = F.unix_millis(F.col("ts"))
    return events.select(
        "event_id",
        ts_ms.alias("epoch_ms"),
        F.timestamp_millis(ts_ms).alias("ts_roundtrip"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )


def systematic_sample(events: DataFrame, modulus: int = 37) -> DataFrame:
    """Deterministic systematic sample: key-modulo filter. Unlike
    ORDER BY RANDOM() LIMIT n (O2), this is reproducible across
    engines, scales without a global sort, and pushes down to the
    scan."""
    from big_data_exercise_spark.functions.numeric import round_det

    return events.filter(F.col("event_id") % modulus == 0).select(
        "event_id", "user_id", "event_type",
        round_det(F.col("value"), 2).alias("value"),
    )


def seeded_sample(events: DataFrame, fraction: float = 0.1, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample — Spark-deterministic (same seed, same
    partitioning → same rows) but not oracle-comparable row-for-row;
    verified by statistical bounds in tests."""
    return events.sample(fraction=fraction, seed=seed)


def clean_text_stats(documents: DataFrame) -> DataFrame:
    """Text-normalization chain (lower → strip non-alphanumerics →
    collapse whitespace → trim): the cleaning pass an LLM data
    pipeline runs before tokenization, as one codegen stage."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]+", ""),
            r"\s+",
            " ",
        )
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(cleaned).alias("clean_len"),
        F.substring(cleaned, 1, 20).alias("clean_prefix"),
    )


def prefix_edit_distances(documents: DataFrame, max_doc_id: int = 15) -> DataFrame:
    """Pairwise Levenshtein distance between document prefixes — the
    edit-distance primitive fuzzy dedup builds on. Bounded kernel
    (doc_id < max): all-pairs edit distance is quadratic by nature;
    at scale it runs only on LSH/blocking candidates.

    The distance is over the ASCII PROJECTION of the text (non-ASCII
    chars stripped first, then the 20-char prefix): Spark's
    levenshtein counts codepoints but DuckDB's counts BYTES, so
    'café' is 4 edits from '' in Spark and 5 in the oracle — on the
    ASCII subset bytes ≡ codepoints and the two agree exactly
    (round-8 fuzz finding; same projection the winnowing kernel
    uses)."""
    ascii_p = F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), r"[^\x20-\x7e]", ""
    )
    pref = documents.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id", F.substring(ascii_p, 1, 20).alias("p")
    )
    a = pref.select(F.col("doc_id").alias("id1"), F.col("p").alias("p1"))
    b = pref.select(F.col("doc_id").alias("id2"), F.col("p").alias("p2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2", F.levenshtein("p1", "p2").alias("edit_distance")
        )
    )


def calendar_features(events: DataFrame) -> DataFrame:
    """Datetime feature extraction (year/month/day/hour/weekday/
    week-of-year/month-end) — one codegen stage, the feature columns a
    time-series model trains on."""
    ts = F.col("ts")
    return events.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.dayofweek(ts).alias("dow"),
        F.dayofyear(ts).alias("doy"),
        F.weekofyear(ts).alias("woy"),
        # timestamp, not date: DateType round-trips as datetime.date on
        # one engine and midnight Timestamp on the other — the one
        # temporal type the comparison layer can't normalize.
        F.last_day(ts).cast("timestamp").alias("month_end"),
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse_json WITHOUT a
    declared schema — the ingestion mode for payloads whose shape
    drifts — then variant_get typed extraction. Complements
    json_props_stats (P2, explicit StructType): same data, the other
    contract. VARIANT keeps the parsed binary form columnar, so
    repeated extractions don't re-parse the string."""
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def string_suite(documents: DataFrame, max_doc_id: int = 50) -> DataFrame:
    """Consolidated string-function surface (SURVEY §2.9 remainder):
    left/substring, reverse, pad, repeat, translate — pure codegen
    expressions, deterministic on the normalized ASCII corpus."""
    head = F.substring(F.col("text"), 1, 12)
    return documents.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id",
        head.alias("head12"),
        F.reverse(head).alias("head12_rev"),
        F.lpad(F.col("lang"), 8, "_").alias("lang_padded"),
        F.translate(F.col("lang"), "aeiou", "AEIOU").alias("lang_vowels"),
        F.repeat(F.col("lang"), 2).alias("lang_twice"),
        F.length(F.col("text")).alias("n_chars"),
    )


def try_arithmetic(events: DataFrame) -> DataFrame:
    """Error-safe expression surface: try_divide / try_element_at /
    try_cast return NULL where the strict forms raise (div-by-zero,
    missing key, malformed cast) — the ingest-hardening contract for
    dirty data at scale (one bad row must not kill a 100 TB job)."""
    ev = events.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("event_id") % 3).alias("per_bucket"),
        F.try_element_at(
            F.split(F.col("event_type"), "u"), F.lit(2)
        ).alias("after_u"),
        F.try_to_number(F.col("event_type"), F.lit("999")).alias("not_a_number"),
    )
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count("per_bucket").alias("n_divisible"),
        F.count("after_u").alias("n_with_u"),
        F.count("not_a_number").alias("n_numeric"),
    )


def xml_roundtrip(events: DataFrame, max_event_id: int = 2000) -> DataFrame:
    """XML serde surface (Spark 4 expressions): struct → to_xml →
    from_xml → fields, net identity. Doubles survive because to_xml
    emits the shortest round-trippable representation. The oracle is
    the identity projection — same contract as the base64/JSON
    roundtrips."""
    x = events.filter(F.col("event_id") < max_event_id).select(
        F.to_xml(F.struct("event_id", "event_type", "value")).alias("x")
    )
    return x.select(
        F.from_xml(
            "x", "event_id LONG, event_type STRING, value DOUBLE"
        ).alias("r")
    ).select("r.event_id", "r.event_type", "r.value")


def corrupt_record_accounting(events: DataFrame) -> DataFrame:
    """Dirty-ingest accounting: deliberately mangle 1% of the JSON
    payloads, parse with from_json (PERMISSIVE — malformed rows yield
    NULL, they never kill the job), and report the parse failure rate
    per event type. This is the quality gate every 100 TB ingest runs
    before trusting a feed; the mangling is keyed on event_id so the
    oracle reproduces exactly which rows fail."""
    # Prefix mangling: Spark's JSON parser TOLERATES trailing garbage
    # ('{"k":69}x' parses), so corruption must break the head.
    # Detection is PERMISSIVE's corrupt-record column — the raw input
    # string lands in it iff the record failed to PARSE. The earlier
    # predicate (extracted field IS NULL) conflated malformed records
    # with VALID records merely missing the field ('{}' parses fine) —
    # invisible on the fixture, whose payloads always carry k; caught
    # by the random-corpus oracle fuzz (round 7).
    #
    # A NULL payload is counted corrupt EXPLICITLY: from_json(NULL)
    # yields a NULL struct with a NULL corrupt-record column (the
    # parser never ran), so without the isNull term a missing payload
    # would silently read as clean — and the positional oracle, which
    # flags every mod-100 row regardless of payload, would diverge on
    # any corpus carrying NULL props (round-8 advice). Remaining
    # pinned assumption, enforced by the fixture and fuzz contracts
    # ("props is always-valid JSON when non-NULL"): a NATURALLY
    # head-malformed non-NULL payload on a non-mod row would be
    # counted here but not by the positional oracle — that class is
    # not SQL-replayable because DuckDB's json validity rules differ
    # from Spark's tolerant parser on trailing garbage.
    mangled = F.when(
        F.col("event_id") % 100 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        mangled,
        "k INT, _malformed STRING",
        {"columnNameOfCorruptRecord": "_malformed"},
    )
    return (
        events.select("event_type", F.col("props").isNull().alias("no_payload"),
                      parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(
                    F.col("no_payload") | F.col("p._malformed").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_corrupt"),
        )
    )


def regex_suite(documents: DataFrame, max_doc_id: int = 100) -> DataFrame:
    """Regex surface beyond regexp_extract: match counting and
    first-match extraction. RE2-safe ASCII classes only, so Java and
    RE2 agree; the no-match cases differ by engine (Spark NULL vs
    DuckDB ''), normalized on the oracle side with NULLIF.

    ``\\b`` is deliberately ABSENT: Java's word-boundary is
    Unicode-aware even while its ``\\w`` stays ASCII (a document like
    'İstanbul' has no boundary before the 's' in Java but does in
    RE2 — round-8 unicode fuzz finding). A greedy ``\\w{7,}`` counts
    exactly the maximal ASCII word runs of length ≥ 7, which is what
    the boundary form counted on ASCII text, without the asymmetry."""
    return documents.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"[aeiou]+")).alias("n_vowel_runs"),
        F.regexp_count(F.col("text"), F.lit(r"\w{7,}")).alias("n_long_words"),
        F.regexp_substr(F.col("text"), F.lit(r"\w{7,}")).alias("first_long_word"),
    )


def date_math_suite(orders: DataFrame, max_orderkey: int = 2000) -> DataFrame:
    """Date arithmetic surface: day differences, month addition with
    end-of-month clamping (Jan 31 + 1 month = Feb 29), day
    subtraction, quarter truncation. Every result is cast to
    timestamp — DateType round-trips differently per engine and is
    the one temporal type the comparison layer can't normalize."""
    d = F.col("o_orderdate")
    return orders.filter(F.col("o_orderkey") < max_orderkey).select(
        "o_orderkey",
        F.datediff(d, F.lit("1996-01-01").cast("timestamp")).alias("days_since_96"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3_months"),
        F.date_sub(d, 7).cast("timestamp").alias("week_before"),
        F.date_trunc("quarter", d).alias("quarter_start"),
    )


def json_path_extract(events: DataFrame) -> DataFrame:
    """Path-based JSON access WITHOUT a declared schema —
    ``get_json_object`` ($.path traversal) and ``json_tuple`` (field
    fan-out), the ad-hoc complement to the from_json+StructType door
    (json_props_stats). Missing paths yield NULL, not errors. At
    scale prefer from_json: path extraction re-parses the string per
    call, a schema parses once into a struct Catalyst can prune."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_path"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.get_json_object("props", "$.k").cast("long").alias("k_long"),
    )
