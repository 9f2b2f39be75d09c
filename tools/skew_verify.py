"""Skewed-distribution verification for the queries whose DuckDB
oracles are infeasible on a 10k-member duplicate clique (round 9).

The skewed twin (tools/gen_skewed.py) makes two oracle families
quadratic ON THE ORACLE SIDE only:

* pair-report oracles — `cand JOIN tt JOIN tt` computes per-pair
  token intersections doc-by-doc with no exact-dup collapse, so a
  10k clique means C(10k,2) ≈ 50M candidate pairs × a token join
  (billions of rows in DuckDB);
* closure oracles — the recursive walk runs over that same quadratic
  pair table (the known sf0.1 gap closure_sf01_verify.py exists for).

The Spark side is fine by design (exact-dup collapse first; the
closure consumes linear star edges). This tool verifies those Spark
results on the skewed dirs with checks that are independent of the
engine's own pair machinery:

1. **Rep-collapsed closure replay** (no-giants twin): run each
   closure oracle's OWN pair-generation prefix in DuckDB over a
   collapsed `documents` view — one representative per distinct text,
   DOUBLED with a clone at doc_id+OFFSET. Identical text ⟹ identical
   token/fingerprint sets ⟹ identical pair statistics, so rep-level
   pairs reproduce all cross-cluster edges and the (rep, rep+OFFSET)
   clone pair decides whether same-text members pair with each other
   in the full report (minhash: always, incl. the zero-token empties
   cluster; winnowing: only when |fps| ≥ min_shared). Union-find over
   rep pairs + qualifying member→rep edges + every doc singleton =
   the full closure; the oracle's UNCHANGED tail (prefix CTEs
   stripped — every tail references only `walk` and the real
   `documents` view) then runs over the materialized walk, and the
   result is hash-compared against Spark exactly as the driver does.
2. **Pair-count identities** (full twin): the generator appends docs
   contributing a CLOSED-FORM pair count — C(10000,2) intra-clique +
   50·C(100,2) intra-near-group, zero cross pairs (cross-group
   Jaccard 0.5303 < 0.8 deterministically; appended vocabularies are
   disjoint from the originals') — so
   count(skew) == count(uniform) + 50,242,500 exactly for every
   ≥0.8-Jaccard pair report. SimHash gets the ≥ bound only (its
   cross-group hamming is deterministic but not closed-form).
3. **Original-docs invariance** (full twin): appended docs share no
   tokens with the originals, so the pair set restricted to original
   ids and the originals' closure assignment must be BIT-IDENTICAL
   to the uniform-dir run — compared frame-to-frame.
4. **Clique structure**: all 10k clique docs land in one cluster
   whose id is the min clique doc_id; each near group is its own
   100-doc cluster; giants are singletons.

Usage: python tools/skew_verify.py [skew_dir] [skew_nogiants_dir]
Env:   SKEW_VERIFY_SECTIONS — comma list of {closure,counts,invariance}
       (default: all three)
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from closure_sf01_verify import _WALK_BLOCK, UnionFind, vhash  # noqa: E402

SKEW_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bdes_skew_sf0.1"
SKEW_NG_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bdes_skew_sf0.1_ng"
UNIFORM_DIR = os.environ.get("SPARK_GRAFT_UNIFORM_DIR", "/root/testdata/sf0.1")

CLIQUE, NEAR_GROUPS, NEAR_PER, N_GIANT = 10_000, 50, 100, 4
PAIR_DELTA = CLIQUE * (CLIQUE - 1) // 2 + NEAR_GROUPS * (
    NEAR_PER * (NEAR_PER - 1) // 2
)
OFFSET = 10_000_000

CLOSURE_QUERIES = [
    "dedup_cluster_assignment",
    "winnowing_cluster_assignment",
    "dedup_kept_corpus",
    "curated_corpus",
    "governed_corpus",
]

FAILS: list[str] = []


def check(label: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}: {label} {detail}", flush=True)
    if not ok:
        FAILS.append(label)


def closure_replay(spark, specs) -> None:
    """Section 1: rep-collapsed oracle replay on the no-giants twin."""
    con = duckdb.connect()
    from big_data_exercise_spark.tables import TABLES

    for t in TABLES:
        con.sql(
            f"CREATE VIEW {'documents_full' if t == 'documents' else t} AS "
            f"SELECT * FROM '{SKEW_NG_DIR}/{t}.parquet'"
        )
    # collapsed + cloned documents view for the pair prefixes
    con.sql(f"""
        CREATE VIEW documents AS
        WITH reps AS (
          SELECT MIN(doc_id) AS doc_id, text
          FROM documents_full GROUP BY text)
        SELECT doc_id, text FROM reps
        UNION ALL
        SELECT doc_id + {OFFSET} AS doc_id, text FROM reps""")
    mem = con.sql(
        "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS rep "
        "FROM documents_full"
    ).fetchall()
    doc_ids = [d for d, _ in mem]

    for name in CLOSURE_QUERIES:
        sql = specs[name].oracle
        assert _WALK_BLOCK in sql, f"{name}: closure block drifted"
        cut = sql.index(_WALK_BLOCK)
        prefix = sql[:cut].rstrip().rstrip(",") + "\nSELECT id1, id2 FROM pairs"
        t0 = time.perf_counter()
        pairs = con.sql(prefix).fetchall()
        t_pairs = time.perf_counter() - t0

        rep_pairs = [(a, b) for a, b in pairs if a < OFFSET and b < OFFSET]
        attach_ok = {a for a, b in pairs if b == a + OFFSET}
        uf = UnionFind()
        for d in doc_ids:
            uf.find(d)
        for a, b in rep_pairs:
            uf.union(a, b)
        for d, rep in mem:
            if d != rep and rep in attach_ok:
                uf.union(d, rep)
        walk = pd.DataFrame(
            {"node": doc_ids, "reach": [uf.find(d) for d in doc_ids]}
        )

        con2 = duckdb.connect()
        for t in TABLES:
            con2.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{SKEW_NG_DIR}/{t}.parquet'"
            )
        con2.register("uf_walk", walk)
        tail = sql[cut + len(_WALK_BLOCK):]
        swapped = "WITH walk AS (SELECT node, reach FROM uf_walk)" + tail
        odf = con2.sql(swapped).df()
        t0 = time.perf_counter()
        sdf = specs[name].build(spark, SKEW_NG_DIR).toPandas()
        t_spark = time.perf_counter() - t0
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and vhash(sdf) == vhash(odf)
        )
        check(
            f"closure_replay/{name}", ok,
            f"({len(sdf)} vs {len(odf)} rows; {len(rep_pairs)} rep pairs; "
            f"oracle {t_pairs:.0f}s, spark {t_spark:.0f}s)",
        )


def pair_counts(spark, specs) -> None:
    """Section 2: closed-form pair-count identities on the full twin."""
    for name in (
        "minhash_near_duplicates",
        "minhash_near_duplicates_prod",
        "exact_jaccard_pairs",
    ):
        t0 = time.perf_counter()
        n_uni = specs[name].build(spark, UNIFORM_DIR).count()
        n_skew = specs[name].build(spark, SKEW_DIR).count()
        check(
            f"pair_count/{name}", n_skew == n_uni + PAIR_DELTA,
            f"(uniform {n_uni} + {PAIR_DELTA} == {n_uni + PAIR_DELTA}, "
            f"got {n_skew}; {time.perf_counter() - t0:.0f}s)",
        )
    t0 = time.perf_counter()
    n_uni = specs["simhash_near_duplicates"].build(spark, UNIFORM_DIR).count()
    n_skew = specs["simhash_near_duplicates"].build(spark, SKEW_DIR).count()
    check(
        "pair_count/simhash_near_duplicates(lower bound)",
        n_skew >= n_uni + PAIR_DELTA,
        f"(uniform {n_uni}, got {n_skew}, bound {n_uni + PAIR_DELTA}; "
        f"{time.perf_counter() - t0:.0f}s)",
    )


def invariance_and_structure(spark, specs) -> None:
    """Sections 3+4: original-docs invariance + clique structure."""
    import pyarrow.parquet as pq

    max_orig = int(
        pq.read_table(f"{UNIFORM_DIR}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pandas().max()
    )
    clique_lo, clique_hi = max_orig + 1, max_orig + CLIQUE
    near_lo, near_hi = clique_hi + 1, clique_hi + NEAR_GROUPS * NEAR_PER

    # pair set restricted to originals: bit-identical between dirs
    for name in ("minhash_near_duplicates", "exact_jaccard_pairs"):
        from pyspark.sql import functions as F

        uni = (
            specs[name].build(spark, UNIFORM_DIR)
            .filter(F.col("id2") <= max_orig).toPandas()
        )
        skw = (
            specs[name].build(spark, SKEW_DIR)
            .filter(F.col("id2") <= max_orig).toPandas()
        )
        check(
            f"orig_invariance/{name}", vhash(uni) == vhash(skw),
            f"({len(uni)} vs {len(skw)} original-restricted pairs)",
        )

    for name in ("dedup_cluster_assignment", "dedup_cluster_assignment_prod"):
        res = specs[name].build(spark, SKEW_DIR).toPandas()
        uni = specs[name].build(spark, UNIFORM_DIR).toPandas()
        res_orig = res[res["doc_id"] <= max_orig]
        check(
            f"orig_invariance/{name}", vhash(res_orig) == vhash(uni),
            f"({len(res_orig)} vs {len(uni)} original rows)",
        )
        cl = res[(res["doc_id"] >= clique_lo) & (res["doc_id"] <= clique_hi)]
        check(
            f"clique_structure/{name}/one-cluster",
            len(cl) == CLIQUE and set(cl["cluster_id"]) == {clique_lo},
            f"({len(cl)} rows, {cl['cluster_id'].nunique()} clusters)",
        )
        nr = res[(res["doc_id"] >= near_lo) & (res["doc_id"] <= near_hi)]
        expected = {near_lo + g * NEAR_PER for g in range(NEAR_GROUPS)}
        ok = len(nr) == NEAR_GROUPS * NEAR_PER and set(
            nr["cluster_id"]
        ) == expected and nr.groupby("cluster_id").size().eq(NEAR_PER).all()
        check(f"clique_structure/{name}/near-groups", bool(ok),
              f"({nr['cluster_id'].nunique()} clusters)")
        gi = res[res["doc_id"] > near_hi]
        check(
            f"clique_structure/{name}/giants-singleton",
            len(gi) == N_GIANT and (gi["cluster_id"] == gi["doc_id"]).all(),
            f"({len(gi)} rows)",
        )


def main() -> None:
    from big_data_exercise_spark.plans.registry import all_queries
    from big_data_exercise_spark.session import get_spark

    specs = all_queries()
    spark = get_spark("skew-verify")
    sections = set(
        os.environ.get(
            "SKEW_VERIFY_SECTIONS", "closure,counts,invariance"
        ).split(",")
    )
    if "closure" in sections:
        closure_replay(spark, specs)
    if "counts" in sections:
        pair_counts(spark, specs)
    if "invariance" in sections:
        invariance_and_structure(spark, specs)
    print("BAD:", ", ".join(FAILS) if FAILS else "none", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
