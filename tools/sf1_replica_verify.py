"""sf1-scale verification for the pair-report and closure queries whose
DuckDB oracles are physically infeasible in this sandbox (round 9).

Two direct attempts at the full minhash pair oracle at the generated
sf1 failed on machine limits, not semantics: DuckDB's default
80%-of-RAM policy was OOM-killed at 110 GB RSS, and a 80 GB
memory_limit + temp spill then filled the disk (~70 GB of spill
against ~76 GB free) — the oracle's candidate join (69M candidates ×
per-doc token expansion) simply exceeds this machine. The Spark side
answers in ~140 s. So sf1 coverage for this family comes from two
independent checks instead:

§1 REPLICA DECOMPOSITION. tools/gen_sf1.py builds sf1 as 10 replicas
of sf0.1 with all doc keys shifted by a fixed stride and every token
prefixed by the replica id, so replicas share ZERO tokens. Token
renaming is bijective per replica (set sizes and intersections — so
every Jaccard value — are invariant), and cross-replica token sets
are disjoint (cross-replica Jaccard is 0 < threshold, so no verified
pair can cross replicas). The sf1 result must therefore decompose
into 10 stride-shifted copies; each copy is hash-compared against the
sf0.1 result, which is itself hash-verified against the real DuckDB
oracle in the same run (the anchor). LSH candidate RECALL is the one
quantity renaming does not preserve (different token bytes → different
vocab ranks → different banding luck), so per-replica equality is an
EMPIRICAL assertion here, not a theorem — exactly why this tool
checks all 10 replicas by hash rather than assuming them.

§2 CLOSURE TAIL AT SF1. For the closure-consuming oracles
(dedup_cluster_assignment, dedup_kept_corpus, curated_corpus,
governed_corpus) only the pair PREFIX is infeasible; the tails are
linear. So: union-find (pure Python, the same swap
tools/closure_sf01_verify.py uses) over the §1-verified Spark pair
set + every sf1 doc_id → materialized `walk` relation → the oracle's
UNCHANGED tail runs in DuckDB over the real sf1 parquet → hash-compare
against the Spark result. This verifies Spark's closure + downstream
aggregation machinery at sf1 against an independent implementation,
conditional only on the pair set established in §1.

Usage: python tools/sf1_replica_verify.py [sf1_dir] [sf01_dir]
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from closure_sf01_verify import _WALK_BLOCK, UnionFind  # noqa: E402

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bdes_sf1"
SF01 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

# Only the minhash-pair-prefixed closure query: the other four closure
# consumers (winnowing_cluster_assignment, dedup_kept_corpus,
# curated_corpus, governed_corpus) are prefixed on the WINNOWING
# fingerprint pairs, whose DuckDB prefix is linear after the round-9
# oracle rewrite — tools/closure_sf01_verify.py runs them directly at
# sf1. (Winnowing is also excluded from §1: fingerprint SELECTION
# depends on token bytes, so the replica token-prefixing legitimately
# changes which fingerprints are winnowed for reps > 0 — measured
# 1/10 replicas equal, exactly the byte-identical replica 0.)
TAIL_QUERIES = ["dedup_cluster_assignment"]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def vhash(pdf: pd.DataFrame) -> str:
    return hashlib.md5(
        canon(pdf).to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def decompose(pdf: pd.DataFrame, id_cols: list[str], stride: int, factor: int):
    """Split an sf1 frame into per-replica frames with ids shifted back;
    asserts no row spans two replicas."""
    reps = [pdf[c] // stride for c in id_cols]
    for r in reps[1:]:
        assert (r == reps[0]).all(), "row crosses replicas"
    out = []
    for k in range(factor):
        part = pdf[reps[0] == k].copy()
        for c in id_cols:
            part[c] = part[c] - k * stride
        out.append(part)
    assert sum(len(p) for p in out) == len(pdf)
    return out


def main() -> None:
    from big_data_exercise_spark.plans.registry import all_queries
    from big_data_exercise_spark.session import get_spark
    from big_data_exercise_spark.tables import TABLES

    specs = all_queries()
    spark = get_spark("sf1-replica-verify")
    con01 = duckdb.connect()
    for t in TABLES:
        con01.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    stride = con01.sql("SELECT MAX(doc_id) + 1 FROM documents").fetchone()[0]
    factor = 10
    bad = []

    # ---- §1 decomposition, anchored on the sf0.1 DuckDB oracle -------
    for name, id_cols in [
        ("minhash_near_duplicates", ["id1", "id2"]),
        ("dedup_cluster_assignment", ["doc_id", "cluster_id"]),
    ]:
        spec = specs[name]
        t0 = time.perf_counter()
        p1 = spec.build(spark, SF1).toPandas()
        p01 = spec.build(spark, SF01).toPandas()
        h01 = vhash(p01)
        anchor = "skipped(recursive-cte)"
        if name == "minhash_near_duplicates":
            # the anchor: sf0.1 Spark result vs the REAL DuckDB oracle
            anchor = vhash(con01.sql(spec.oracle).df()) == h01
        parts = decompose(p1, id_cols, stride, factor)
        greens = sum(vhash(p) == h01 for p in parts)
        ok = greens == factor and anchor in (True, "skipped(recursive-cte)")
        print(
            f"§1 {name}: replicas_green={greens}/{factor} "
            f"sf1_rows={len(p1)} sf01_rows={len(p01)} "
            f"oracle_anchor={anchor} ({time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
        if not ok:
            bad.append(name)
        if name == "minhash_near_duplicates":
            pairs1 = p1  # reused by §2

    # ---- §2 oracle tails at sf1 over a union-find walk ----------------
    t0 = time.perf_counter()
    con1 = duckdb.connect()
    for t in TABLES:
        con1.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF1}/{t}.parquet'")
    doc_ids = [r[0] for r in con1.sql("SELECT doc_id FROM documents").fetchall()]
    uf = UnionFind()
    for d in doc_ids:
        uf.find(d)
    for a, b in zip(pairs1["id1"].to_numpy(), pairs1["id2"].to_numpy()):
        uf.union(int(a), int(b))
    walk = pd.DataFrame({"node": doc_ids, "reach": [uf.find(d) for d in doc_ids]})
    con1.register("uf_walk", walk)
    print(f"§2 union-find walk over {len(pairs1)} pairs: "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    for name in TAIL_QUERIES:
        spec = specs[name]
        sql = spec.oracle
        assert _WALK_BLOCK in sql, f"{name}: closure block drifted"
        swapped = sql.replace(
            _WALK_BLOCK, "walk AS (SELECT node, reach FROM uf_walk)"
        ).replace("WITH RECURSIVE", "WITH")
        t0 = time.perf_counter()
        odf = con1.sql(swapped).df()
        t_tail = time.perf_counter() - t0
        t0 = time.perf_counter()
        sdf = spec.build(spark, SF1).toPandas()
        t_spark = time.perf_counter() - t0
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and vhash(sdf) == vhash(odf)
        )
        print(
            f"§2 {name}: hash_match={ok} ({len(sdf)} vs {len(odf)} rows; "
            f"tail {t_tail:.0f}s, spark {t_spark:.0f}s)",
            flush=True,
        )
        if not ok:
            bad.append(name)

    print("BAD:", ", ".join(bad) if bad else "none")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
