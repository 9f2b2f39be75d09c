"""Broadcast-gather cosine verify (functions.arrays.gathered_pair_cosine)
vs the payload-join + arrow_pair_cosine form: the two physical plans
behind lsh.near_duplicates / knn.blocked_near_duplicates must be
bit-identical on clean AND dirty corpora, and the gather must keep the
inner-join id semantics of the plan it replaces.

The sf1 scale slice (round 9) found the payload-join form shipping
~51 GB of per-pair float arrays through Arrow on the LSH verify; the
gather form is the fix, and these lanes pin that it is a pure physical
change.
"""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_exercise_spark.functions import arrays
from big_data_exercise_spark.similarity import knn, lsh

from .conftest import SF_DIR


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def _dirty_embeddings(spark):
    """sf0.001 embeddings plus the dirty-vector corpus: NULL, ragged
    (short/long), and zero-norm rows — every class the round-8 dirty
    fuzz pinned against the joined plan."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = arrays.EMBEDDING_DIM
    extra = pd.DataFrame(
        {
            "vec_id": [900001, 900002, 900003, 900004, 900005],
            "embedding": [
                None,
                [0.5] * (dim - 3),
                [0.25] * (dim + 2),
                [0.0] * dim,
                [1.0] + [0.0] * (dim - 1),
            ],
            "label": [1, 1, 1, 1, 1],
        }
    )
    extra_df = spark.createDataFrame(extra).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        "label",
    )
    return base.unionByName(extra_df)


@pytest.mark.parametrize(
    "build",
    [
        lambda e: lsh.near_duplicates(e),
        lambda e: knn.blocked_near_duplicates(e),
    ],
    ids=["lsh", "blocked"],
)
def test_gather_vs_join_bit_identical(spark, build, monkeypatch):
    emb = _dirty_embeddings(spark)
    gathered = _canon(build(emb))
    # force the payload-join regime
    monkeypatch.setattr(arrays, "GATHER_GATE_ROWS", -1)
    joined = _canon(build(emb))
    pd.testing.assert_frame_equal(gathered, joined)
    assert len(gathered) > 0


def test_gather_drops_unknown_ids_like_inner_join(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(2).collect()
    known = [r.vec_id for r in rows]
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id1": [known[0], known[0], 123456789],
                "id2": [known[1], 987654321, 123456790],
            }
        )
    )
    out = arrays.gathered_pair_cosine(
        pairs, emb, "vec_id", "embedding", "id1", "id2", ["id1", "id2"]
    ).toPandas()
    # only the fully-known pair survives, exactly as the inner join would
    assert len(out) == 1
    assert out.iloc[0]["id1"] == known[0] and out.iloc[0]["id2"] == known[1]
    v1 = np.asarray(rows[0].embedding, dtype=np.float64)
    v2 = np.asarray(rows[1].embedding, dtype=np.float64)
    expected = float(v1 @ v2) / (float(np.linalg.norm(v1)) * float(np.linalg.norm(v2)))
    assert out.iloc[0]["cos_raw"] == pytest.approx(expected, rel=1e-12)


def test_gather_empty_embedding_table_returns_empty(spark):
    """Empty broadcast side: inner-join semantics demand an EMPTY result,
    not an executor IndexError from sids[np.clip(i, 0, -1)] (round-9
    advice item)."""
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 0)
    )
    pairs = spark.createDataFrame(pd.DataFrame({"id1": [1, 2], "id2": [3, 4]}))
    out = arrays.gathered_pair_cosine(
        pairs, emb, "vec_id", "embedding", "id1", "id2", ["id1", "id2"]
    ).toPandas()
    assert len(out) == 0
    assert list(out.columns) == ["id1", "id2", "cos_raw"]


def test_gather_duplicate_id_resolves_first(spark):
    """Precondition-violation degradation pinned: a duplicated id in the
    embedding table resolves to the FIRST occurrence (searchsorted
    side='left' over a stable mergesort argsort), per the docstring."""
    dim = arrays.EMBEDDING_DIM
    e1 = [1.0] + [0.0] * (dim - 1)          # duplicate id 7, first row
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)     # duplicate id 7, second row
    q = [1.0] + [0.0] * (dim - 1)           # id 8: cos(q,e1)=1, cos(q,e2)=0
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [7, 7, 8], "embedding": [e1, e2, q]})
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    pairs = spark.createDataFrame(pd.DataFrame({"id1": [7], "id2": [8]}))
    out = arrays.gathered_pair_cosine(
        pairs, emb, "vec_id", "embedding", "id1", "id2", ["id1", "id2"]
    ).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["cos_raw"] == pytest.approx(1.0, abs=1e-12)
