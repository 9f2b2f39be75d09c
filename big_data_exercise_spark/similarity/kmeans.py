"""Lloyd's k-means over embedding vectors, expressed relationally —
the iterative-algorithm archetype (assign → update → repeat) that a
training-data pipeline runs to build IVF coarse quantizers and corpus
cluster maps (generalizes similarity/knn.py's one-shot IVF centroid
assignment into the loop that *produces* such centroids).

Engine-exact by construction: embeddings are fixed-point quantized to
non-negative BIGINTs up front (``floor((v + 1) * 1e6)``), so every
downstream step is integer arithmetic —

* squared-L2 distances are BIGINT sums (order-independent, no float
  accumulation drift);
* centroid updates use floor division (``DIV`` in Spark, ``//`` in
  DuckDB — identical on non-negative operands, which the +1 shift
  guarantees for this embedding family);
* argmin ties break on the lower cluster id.

A SQL oracle can therefore replay the whole loop bit-for-bit with
unrolled CTEs (plans/registry.py generates it per iteration count).

Scale shape (100 TB): the long form shuffles once at build; each
iteration is one broadcast join (centroids are k x n_dims rows — tiny
by definition) + two aggregations keyed on (vid, cid) / (cid, dim).
No all-pairs, no driver collect; per-round lineage is cut with
localCheckpoint (cluster deployments: persist(DISK_ONLY) or a
checkpoint dir). Iteration count is a parameter, not a convergence
probe, so round count — and the oracle — is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QSCALE = 1000000.0  # fixed-point: q = floor((v + 1) * QSCALE), non-negative


def quantized_long(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vid, dim, q): vectors exploded to long form and fixed-point
    quantized. The float → double widening, +1 shift, scale and floor
    are each exact IEEE ops, so any engine derives the same BIGINT."""
    return embeddings.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("dim", "v")
    ).select(
        "vid",
        "dim",
        F.floor((F.col("v").cast("double") + F.lit(1.0)) * F.lit(QSCALE))
        .cast("long")
        .alias("q"),
    )


def _assign(long_df: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast the (cid, dim, qc) table,
    sum squared diffs per (vid, cid), argmin via struct-min (ties →
    lower cid)."""
    diff = F.col("q") - F.col("qc")
    dists = (
        long_df.join(F.broadcast(cents), "dim")
        .groupBy("vid", "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    best = dists.groupBy("vid").agg(F.min(F.struct("dist", "cid")).alias("b"))
    return best.select("vid", F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist"))


def _update(long_df: DataFrame, assign_df: DataFrame) -> DataFrame:
    """Centroid refresh: per-(cid, dim) floor-divided mean of member
    coordinates. A cluster that lost every member simply drops out
    (deterministically, in both engines)."""
    return (
        long_df.join(assign_df.select("vid", "cid"), "vid")
        .groupBy("cid", "dim")
        .agg(F.expr("CAST(sum(q) DIV count(1) AS BIGINT)").alias("qc"))
    )


def _assign_arrow(
    embeddings: DataFrame, cents: DataFrame, n_dims: int = 64
) -> DataFrame:
    """(vid, cid, dist) nearest-centroid assignment via a
    broadcast-codebook numpy kernel — the same construction as
    ``pq._codes_arrow`` and bit-identical to :func:`_assign`: the
    fixed-point quantization is the same exact IEEE ops, every
    distance intermediate is an integer < 2⁵³ (coords ≤ 2·QSCALE, so
    diff² ≤ 4e12 and a 64-dim sum ≤ 2.6e14), so the float64 matmul is
    exact, and ``np.argmin``'s first-hit over cid-ascending rows IS
    struct-min's lowest-cid tie-break. The centroid collect is
    bounded: ≤ k·n_dims rows (512 at the registry config). NULL or
    wrong-width embeddings drop per-row, as in ``pq._codes_arrow``."""
    import numpy as np

    crows = cents.select("cid", "dim", "qc").collect()
    by_cid: dict = {}
    for r in crows:
        by_cid.setdefault(r["cid"], {})[r["dim"]] = r["qc"]
    order = sorted(by_cid)
    mat = np.zeros((len(order), n_dims), dtype=np.float64)
    for i, cid in enumerate(order):
        for dim, qc in by_cid[cid].items():
            mat[i, dim] = qc
    cid_arr = np.asarray(order, dtype=np.int32)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            emb = pdf["embedding"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            ok = np.fromiter(
                (v is not None and len(v) == n_dims for v in emb),
                dtype=bool,
                count=len(pdf),
            )
            if not ok.all():
                emb, vids = emb[ok], vids[ok]
            if not len(vids):
                continue
            v = np.vstack(emb).astype(np.float64)
            q = np.floor((v + 1.0) * QSCALE)
            dist = (
                (q * q).sum(axis=1)[:, None]
                + (mat * mat).sum(axis=1)[None, :]
                - 2.0 * (q @ mat.T)
            )
            idx = np.argmin(dist, axis=1)
            yield pd.DataFrame(
                {
                    "vid": vids,
                    "cid": cid_arr[idx],
                    "dist": dist[np.arange(len(idx)), idx].astype(np.int64),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vid long, cid int, dist long"
    )


def kmeans_assignments(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    arrow_assign: bool = False,
    n_dims: int = 64,
) -> DataFrame:
    """(vec_id, cluster, dist) after ``iters`` Lloyd updates and a
    final assignment. Init: the vectors with the ``k`` smallest ids
    are the seed centroids (cluster = rank order) — deterministic, no
    RNG to reconcile across engines. ``arrow_assign`` swaps every
    assignment step's k×-fan-out broadcast join + two shuffle
    aggregations for the bit-identical numpy kernel
    (:func:`_assign_arrow`) over a bounded centroid collect — the
    round-11 path the registry query uses; the relational form remains
    the oracle's definition and the equivalence-test anchor."""
    # Lazy checkpoints throughout (round 11): every table is still
    # materialized once and shared by all consumers, but inside the
    # consuming job instead of as per-round driver barriers (job-count
    # probe: 22 jobs at sf0.01 with eager rounds).
    long_df = quantized_long(embeddings).localCheckpoint(eager=False)
    seeds = (
        long_df.select("vid")
        .distinct()
        .orderBy("vid")
        .limit(k)
        # rank the k seed rows WITHOUT a window (a constant partition
        # key gets constant-folded out of the spec and still warns):
        # cid = count of smaller vids, via the k²-cheap broadcast
        # triangular join — k rows, no sort, no single-partition stage.
        .withColumn("_one", F.lit(1))
    )
    from big_data_exercise_spark.operators.windows import (
        broadcast_prefix_offsets,
    )

    seeds = broadcast_prefix_offsets(seeds, "vid", "_one", "cid").select(
        "vid", F.col("cid").cast("int").alias("cid")
    )
    cents = (
        long_df.join(seeds, "vid")
        .select("cid", "dim", F.col("q").alias("qc"))
        .localCheckpoint(eager=False)
    )
    step = (
        (lambda c: _assign_arrow(embeddings, c, n_dims))
        if arrow_assign
        else (lambda c: _assign(long_df, c))
    )
    for _ in range(iters):
        assigned = step(cents)
        cents = _update(long_df, assigned).localCheckpoint(eager=False)
    final = step(cents)
    return final.select(
        F.col("vid").alias("vec_id"),
        F.col("cid").cast("int").alias("cluster"),
        F.col("dist").alias("dist"),
    )


def kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """DuckDB oracle replaying kmeans_assignments bit-for-bit:
    unrolled CTE chain c0 → (a1, c1) → ... → final assignment."""
    lf = """lf AS (
      SELECT vid, u.dim AS dim, u.q AS q FROM (
        SELECT vec_id AS vid,
               unnest([{'dim': i - 1,
                        'q': CAST(floor((CAST(embedding[i] AS DOUBLE) + 1.0)
                                        * 1000000.0) AS BIGINT)}
                       for i in range(1, len(embedding) + 1)]) AS u
        FROM embeddings) t),
    init AS (
      SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS INTEGER) AS cid
      FROM (SELECT DISTINCT vid FROM lf ORDER BY vid LIMIT {k}) s),
    c0 AS (
      SELECT i.cid, l.dim, l.q AS qc FROM lf l JOIN init i USING (vid))"""
    parts = [lf.replace("{k}", str(k))]
    for it in range(1, iters + 2):
        parts.append(f"""d{it} AS (
      SELECT l.vid, c.cid,
             CAST(SUM((l.q - c.qc) * (l.q - c.qc)) AS BIGINT) AS dist
      FROM lf l JOIN c{it - 1} c USING (dim) GROUP BY 1, 2),
    a{it} AS (
      SELECT vid, cid, dist FROM (
        SELECT vid, cid, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM d{it}) r WHERE rn = 1)""")
        if it <= iters:
            parts.append(f"""c{it} AS (
      SELECT a.cid, l.dim, CAST(SUM(l.q) // COUNT(*) AS BIGINT) AS qc
      FROM lf l JOIN a{it} a USING (vid) GROUP BY 1, 2)""")
    final = iters + 1
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT vid AS vec_id, CAST(cid AS INTEGER) AS cluster, dist
    FROM a{final}"""
    )
