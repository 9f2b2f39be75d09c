"""big_data_exercise_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``binhphan-dxt/big-data-exercise``
(three Kafka → Spark Structured Streaming → JDBC pipelines plus SQL
dashboards; see SURVEY.md), extended with the operators a large-scale
training-data pipeline needs: deduplication, similarity search,
multimodal binary columns, and text analysis.

Design stance (SURVEY.md §7.1):

* **Batch relational layer** — every operator from SURVEY.md §2 as a
  composable DataFrame function over parquet tables.
* **Streaming layer** — the same transforms over ``readStream`` sources
  with watermarks/windows and ``foreachBatch`` sinks; every streaming
  transform is runnable in batch mode for oracle checking.
* **Inference / multimodal layer** — Arrow-batched ``pandas_udf``
  operators with deterministic fallback models (the reference's own
  pattern: lazy per-worker singleton + heuristic fallback).
* **Scale extensions** — exact & approximate dedup, embedding top-k,
  text quality scoring, designed for 1000-executor / 100 TB operation:
  broadcast small sides, partial aggregation, no driver-side loops.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

# Worker self-location (PYTHONPATH pinning for pickled UDF imports)
# happens in session.get_spark() immediately before SparkSession
# construction — importing this package mutates no process-global
# state (see session._pin_pythonpath).

from big_data_exercise_spark.session import get_spark, tune_session  # noqa: F401
from big_data_exercise_spark.tables import TABLES, load_table, register_views  # noqa: F401
