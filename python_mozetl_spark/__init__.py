"""python_mozetl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities catalogued from mozilla/python_mozetl (see SURVEY.md), plus
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) such an engine needs at
100 TB scale.

Layers (SURVEY.md §7.1):
  session    — SparkSession factory (AQE, Arrow, UTC, sink policy)
  sources/   — parquet/json readers, schema registry, ensure_columns
  sinks/     — partitioned parquet/json writers, small-artifact sinks
  operators/ — reusable dataflow operators (explode, window dedup,
               table-driven wide agg, pivot, collapse, sampling)
  functions/ — column-expression helpers (text, hashing, vectors, maps)
  plans/     — the graded query registry + DuckDB oracle SQL
  ext/       — dedup (minhash/simhash/jaccard), similarity search,
               multimodal binary plumbing
  streaming/ — Structured Streaming equivalents of the batch rollups
  jobs/      — reference-job parity compositions (clients_daily, ...)
"""

__version__ = "0.1.0"

from python_mozetl_spark.session import get_session  # noqa: F401
