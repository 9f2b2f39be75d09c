"""Combined hostile axes: SKEWED data at SF1 scale (round 10,
VERDICT item 4). Round 9 tested skew at sf0.1 and scale at sf1 —
never together; this campaign runs both on the gen_skewed twin of the
generated sf1 dir (same generator, clique kept at 10k — the identity
constant stays closed-form and the clique-vs-corpus ratio at sf1 is
the more realistic regime anyway; documented builder's call).

Three checks, engine-side only (the pair-report oracles are
machine-infeasible here by round-9 measurement; their identity twins
below are the designed verification route):

1. **10 heaviest engine queries, count-sink**: the spill-probe HEAVY
   list (the dedup/closure/similarity/curation tier + the
   stream-stream join) each run to a count on the skewed sf1 dir;
   walls recorded. A failure or a >15-min wall is a campaign failure.
2. **Funnel check via the UI REST taskSummary**: for every completed
   stage with >3 tasks and max task time >30 s, flag if max >10×
   median — the round-9 LSH funnel signature (one task emitting all
   candidate pairs while 31 cores idle).
3. **§2 pair-count identities at sf1**: count(skew) − count(uniform)
   == C(10k,2) + 50·C(100,2) = 50,242,500 exactly for
   minhash_near_duplicates(+prod) and exact_jaccard_pairs; simhash
   gets the ≥ lower bound (its hamming verify rejects cross pairs
   deterministically but not closed-form).

Usage: python tools/skew_sf1_campaign.py [skew_sf1_dir] [uniform_sf1_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKEW_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bdes_skew_sf1"
UNIFORM_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bdes_sf1"
for d in (SKEW_DIR, UNIFORM_DIR):
    if not os.path.isdir(d):
        sys.exit(f"skew_sf1_campaign: {d!r} is not a directory")

PAIR_DELTA = 10_000 * 9_999 // 2 + 50 * (100 * 99 // 2)  # 50,242,500

HEAVY = [
    "dedup_cluster_assignment",
    "dedup_cluster_assignment_prod",
    "minhash_near_duplicates",
    "minhash_near_duplicates_prod",
    "simhash_near_duplicates",
    "curated_corpus",
    "governed_corpus",
    "pq_topk",
    "embedding_lsh_near_duplicates",
    "stream_stream_join",
]

FAILS: list[str] = []


def check(label: str, ok: bool, detail: str = "") -> None:
    print(f"{label}: {'PASS' if ok else 'FAIL'} {detail}", flush=True)
    if not ok:
        FAILS.append(label)


def _json(url: str):
    return json.load(urllib.request.urlopen(url))


def funnel_scan(ui: str, seen: set[int]) -> list[str]:
    """Flag stages whose max task time is >10x the median and >30 s —
    the single-task-funnel signature. Returns flagged descriptions and
    marks stages as seen so each query scans only its own stages."""
    apps = _json(f"{ui}/api/v1/applications")
    app_id = apps[0]["id"]
    flagged = []
    for st in _json(f"{ui}/api/v1/applications/{app_id}/stages?status=complete"):
        sid, att = st["stageId"], st["attemptId"]
        if sid in seen or st.get("numCompleteTasks", 0) <= 3:
            continue
        seen.add(sid)
        try:
            q = _json(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
                f"taskSummary?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        med, mx = q["executorRunTime"][0], q["executorRunTime"][1]
        if mx > 30_000 and mx > 10 * max(1.0, med):
            flagged.append(f"stage {sid}: max {mx / 1e3:.1f}s vs median {med / 1e3:.1f}s")
    return flagged


def main() -> None:
    from big_data_exercise_spark.plans.registry import all_queries
    from big_data_exercise_spark.session import get_spark

    specs = all_queries()
    spark = get_spark("skew-sf1", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    seen: set[int] = set()

    print("== 1+2: heavy tier on the skewed sf1 dir ==", flush=True)
    for name in HEAVY:
        t0 = time.perf_counter()
        try:
            n = specs[name].build(spark, SKEW_DIR).count()
            wall = round(time.perf_counter() - t0, 1)
            flagged = funnel_scan(ui, seen)
            check(
                f"heavy/{name}", wall < 900 and not flagged,
                f"(rows={n}, wall={wall}s"
                + (f", FUNNELS: {'; '.join(flagged)}" if flagged else "")
                + ")",
            )
        except Exception as exc:  # noqa: BLE001
            check(f"heavy/{name}", False, f"({type(exc).__name__}: {str(exc)[:200]})")

    print("== 3: pair-count identities skew(sf1) vs uniform(sf1) ==", flush=True)
    for name in (
        "minhash_near_duplicates",
        "minhash_near_duplicates_prod",
        "exact_jaccard_pairs",
    ):
        n_uni = specs[name].build(spark, UNIFORM_DIR).count()
        n_skw = specs[name].build(spark, SKEW_DIR).count()
        check(
            f"pair_identity/{name}",
            n_skw - n_uni == PAIR_DELTA,
            f"({n_skw} - {n_uni} = {n_skw - n_uni}, want {PAIR_DELTA})",
        )
    n_uni = specs["simhash_near_duplicates"].build(spark, UNIFORM_DIR).count()
    n_skw = specs["simhash_near_duplicates"].build(spark, SKEW_DIR).count()
    check(
        "pair_identity/simhash_near_duplicates(lower bound)",
        n_skw >= n_uni + PAIR_DELTA,
        f"({n_skw} >= {n_uni} + {PAIR_DELTA})",
    )

    print("BAD:", ", ".join(FAILS) if FAILS else "none", flush=True)
    spark.stop()
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
