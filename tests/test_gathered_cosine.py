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
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    known = [r.vec_id for r in emb.select("vec_id").limit(2).collect()]
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
    assert out.iloc[0]["cos_raw"] == pytest.approx(out.iloc[0]["cos_raw"])
