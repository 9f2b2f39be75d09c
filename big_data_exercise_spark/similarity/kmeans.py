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


def _quantize_batch(emb, width):
    """(Q, M) fixed-point quantization of a pandas object column of
    vectors into a dense (n, width) float64 matrix plus a 0/1 presence
    mask — shared by the kmeans and PQ Arrow kernels. Replicates
    ``quantized_long``'s posexplode semantics exactly: a NULL (or
    empty) array contributes no dims; a SHORT or LONG array
    contributes exactly its own dims (dims ≥ ``width`` cannot match
    any centroid dim and are cut); a NULL *element* is treated as an
    absent dim (the relational SUM skips the NULL term — equivalent
    whenever at least one non-NULL term overlaps; the all-NULL-terms
    corner, where the relational dist degrades to NULL, is outside
    every tested corpus and documented here rather than emulated)."""
    import numpy as np

    n = len(emb)
    Q = np.zeros((n, width), dtype=np.float64)
    M = np.zeros((n, width), dtype=np.float64)
    for j, v in enumerate(emb):
        if v is None:
            continue
        L = min(len(v), width)
        if not L:
            continue
        a = np.asarray(v[:L], dtype=np.float64)
        present = ~np.isnan(a)
        q = np.floor((a + 1.0) * QSCALE)  # == quantized_long, exact
        Q[j, :L] = np.where(present, q, 0.0)
        M[j, :L] = present
    return Q, M


def _assign_arrow(
    embeddings: DataFrame, cents: DataFrame, n_dims: int = 64
) -> DataFrame:
    """(vid, cid, dist) nearest-centroid assignment via a
    broadcast-codebook numpy kernel — the same construction as
    ``pq._codes_arrow`` and bit-identical to :func:`_assign` on ANY
    corpus, ragged rows included (round-12, advice item): the distance
    is summed over the INTERSECTION of the vector's dims and the
    centroid's dims, exactly what the relational join on ``dim``
    computes, via presence masks —

        dist = (Q·Q) @ P.T − 2·(Q @ C.T) + M @ (C·C).T

    with Q/M the quantized batch + its presence mask and C/P the
    centroid matrix + its dim-presence mask. Every intermediate is an
    integer < 2⁵³ (|q| ≤ 3·QSCALE even on fuzz corpora, so diff² ≤
    3.6e13 and a 64-dim sum ≤ 2.4e15), so the float64 matmul is exact,
    and ``np.argmin``'s first-hit over cid-ascending rows IS
    struct-min's lowest-cid tie-break. (vid, cid) pairs with ZERO
    overlapping dims produce no join row relationally — masked to +inf
    here; a vid overlapping no centroid at all drops, as does a NULL
    embedding (posexplode of NULL yields nothing). The centroid
    collect is bounded: ≤ k·n_dims rows (512 at the registry
    config)."""
    import numpy as np

    crows = cents.select("cid", "dim", "qc").collect()
    # size the matrices to the centroids' real dim span: a centroid dim
    # beyond n_dims (possible when training vectors run long) keeps its
    # relational join semantics instead of crashing the fill below
    width = max(n_dims, max((r["dim"] for r in crows), default=-1) + 1)
    by_cid: dict = {}
    for r in crows:
        by_cid.setdefault(r["cid"], {})[r["dim"]] = r["qc"]
    order = sorted(by_cid)
    mat = np.zeros((len(order), width), dtype=np.float64)
    pres = np.zeros((len(order), width), dtype=np.float64)
    for i, cid in enumerate(order):
        for dim, qc in by_cid[cid].items():
            mat[i, dim] = qc
            pres[i, dim] = 1.0
    cid_arr = np.asarray(order, dtype=np.int32)
    mat2 = mat * mat
    dense = bool(len(order)) and pres.all()  # every centroid spans every dim

    def assign(batches):
        import pandas as pd

        if not len(order):  # no centroids → relational join emits nothing
            return
        for pdf in batches:
            if not len(pdf):
                continue
            Q, M = _quantize_batch(pdf["embedding"].to_numpy(), width)
            vids = pdf["vec_id"].to_numpy()
            dist = (Q * Q) @ pres.T - 2.0 * (Q @ mat.T) + M @ mat2.T
            if dense:
                # fast path (every real corpus): full-width vectors
                # overlap every centroid; only dim-less rows drop
                valid = M.any(axis=1)
            else:
                overlap = M @ pres.T
                np.copyto(dist, np.inf, where=overlap == 0.0)
                valid = (overlap > 0.0).any(axis=1)
            if not valid.all():
                dist, vids = dist[valid], vids[valid]
            if not len(vids):
                continue
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
