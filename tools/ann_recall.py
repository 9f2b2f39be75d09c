"""Measured recall@k for the approximate ANN tier vs exact ground
truth (numpy), sf0.1 (2000 x 64-dim vectors), 16 queries, k=10.
IVF: nprobe sweep. PQ: default config vs exact integer-L2 truth.
LSH: the registry's pair-recall report. Walls come from bench.py;
this script only measures quality."""
import sys

import duckdb
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
K = 10
NQ = 16


def main():
    from big_data_exercise_spark.session import get_spark
    from big_data_exercise_spark.similarity import knn, pq
    from big_data_exercise_spark.similarity.kmeans import QSCALE
    from big_data_exercise_spark.tables import load_table

    spark = get_spark("ann-recall", cpus=8, shuffle_partitions=8)
    emb = load_table(spark, SF, "embeddings")

    rows = duckdb.sql(
        f"select vec_id, embedding from '{SF}/embeddings.parquet' order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = np.round(Xn @ Xn.T, 4)  # operators round to 4dp before ordering

    def truth_cos(qi):
        s = cos[qi].copy()
        s[qi] = -np.inf
        # tie-break mirrors the operators: desc cos, asc vec_id
        order = np.lexsort((ids, -s))
        return set(ids[order[:K]])

    # --- brute (sanity: recall must be 1.0) -------------------------
    got = knn.cosine_topk_batch(emb, n_queries=NQ, k=K).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = np.mean([len(by_q[q] & truth_cos(q)) / K for q in by_q])
    print(f"brute cosine_topk_batch recall@{K}: {rec:.3f} over {len(by_q)} queries")

    # --- IVF nprobe sweep -------------------------------------------
    for nprobe in (1, 2, 4, 8):
        recs = []
        for q in range(NQ):
            top = {r["vec_id"] for r in knn.ivf_topk(emb, query_id=q, k=K, nprobe=nprobe).collect()}
            recs.append(len(top & truth_cos(q)) / K)
        print(f"ivf nprobe={nprobe}/8 recall@{K}: {np.mean(recs):.3f} (min {min(recs):.1f})", flush=True)

    # --- PQ vs exact integer-L2 truth --------------------------------
    Q = np.floor((X + 1.0) * QSCALE).astype(np.int64)

    def truth_l2(qi):
        d = ((Q - Q[qi]) ** 2).sum(axis=1)
        d[qi] = np.iinfo(np.int64).max
        order = np.lexsort((ids, d))
        return set(ids[order[:K]])

    for kcent, rerank in ((4, 4), (4, 16), (16, 4), (16, 8)):
        got = pq.pq_topk(emb, n_queries=NQ, k=K, kcent=kcent, rerank=rerank).collect()
        by_q = {}
        for r in got:
            d = r.asDict()
            by_q.setdefault(d.get("query_id", d.get("qid")), set()).add(
                d.get("vec_id", d.get("vid"))
            )
        recs = [len(by_q[q] & truth_l2(q)) / K for q in sorted(by_q)]
        print(f"pq m=4 kcent={kcent} rerank={rerank} recall@{K}: {np.mean(recs):.3f} (min {min(recs):.1f})", flush=True)

    # --- PQ production config (pq_topk_prod: PQ64) --------------------
    got = pq.pq_topk_prod(emb, n_queries=NQ, k=K).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recs = [len(by_q[q] & truth_l2(q)) / K for q in sorted(by_q)]
    print(
        f"pq_topk_prod m={pq.M_SUBS_PROD} kcent={pq.K_CENTS_PROD} "
        f"rerank={pq.RERANK_PROD} iters={pq.ITERS_PROD} "
        f"recall@{K}: {np.mean(recs):.3f} (min {min(recs):.1f})",
        flush=True,
    )

    # --- LSH pair recall (registry report) ---------------------------
    import __spark_entry__ as entry

    rep = entry.queries()["lsh_recall_report"](spark, SF).collect()
    print("lsh_recall_report:", [r.asDict() for r in rep])


if __name__ == "__main__":
    main()
