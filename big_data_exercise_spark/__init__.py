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

import os as _os
import sys as _sys

# Self-locate for Spark Python workers: pickled UDFs / Python data
# sources reference this package by module name, and local-mode workers
# resolve imports through the PYTHONPATH captured when the JVM starts.
# If the driver process imported us via sys.path manipulation (or an
# unrelated cwd), workers would fail with ModuleNotFoundError — so pin
# the repo root into PYTHONPATH *before* any SparkSession exists.
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + (_os.pathsep + _pp if _pp else "")
    )
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

from big_data_exercise_spark.session import get_spark, tune_session  # noqa: F401
from big_data_exercise_spark.tables import TABLES, load_table, register_views  # noqa: F401
