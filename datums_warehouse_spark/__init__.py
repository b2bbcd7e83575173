"""datums_warehouse_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
``SwamyDev/datums-warehouse`` (a single-node Python time-series warehouse for
OHLCV exchange data) on top of Apache Spark, extended with the relational,
window, time-series, and LLM-data-pipeline operators catalogued in
``SURVEY.md §2``.

Design principles (SURVEY.md §3.2/§4):

- DataFrame/SQL everywhere; Catalyst + AQE + whole-stage codegen do the
  physical planning. No RDDs.
- Every operator is registered as a named query (``registry.query``) with an
  optional DuckDB oracle SQL string so correctness is machine-checkable.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched pandas
  UDFs only where built-ins genuinely can't express the semantics.
- Deterministic cross-engine results: decimal-cast money sums, µs-normalized
  event timestamps, unique total sort keys under LIMIT.
"""

from datums_warehouse_spark.registry import all_queries, oracle_map, query

__all__ = ["all_queries", "oracle_map", "query"]
__version__ = "0.1.0"
