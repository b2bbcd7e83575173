"""Custom Python DataSource connector (PySpark 4 `pyspark.sql.datasource`).

The escape hatch for sources Spark has no built-in reader for (internal
feed formats, service APIs, bespoke binary layouts): implement
`DataSource`/`DataSourceReader` in Python, register it on the session, and
the result is a first-class DataFrame scan — partitioned, Arrow-batched,
and composable with every downstream operator.

The demo connector here reads a parquet file through pyarrow purely so the
DuckDB oracle can read the identical bytes and hash-compare the result;
the *connector surface* (partition planning on the driver, per-partition
Arrow-batch iteration on executors, explicit column projection) is exactly
what a real custom-format reader implements.

Scale shape: `partitions()` returns one split per parquet row group, so a
100 TB dataset fans out to as many concurrent reader tasks as it has row
groups (~800k at 128 MB each) — the same split granularity as Spark's
native parquet scan. Each `read()` yields pyarrow RecordBatches (zero-copy
Arrow transfer into the JVM, never per-row Python), and reads only the
three projected columns. The classes are defined INSIDE the query function
so cloudpickle ships them by value — executor workers do not have this
repo on PYTHONPATH.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.registry import query


@query(
    "s10_python_datasource",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE n_chars >= 200
        GROUP BY lang
    """,
    tags=("S10",),
)
def s10_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats read through the custom Python connector — the
    aggregate runs on a DataFrame whose scan is the registered
    `docs_pyarrow` source, proving the connector composes with ordinary
    relational operators and the whole plan stays lazy until action.
    """
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    path = os.path.join(sf_dir, "documents.parquet")

    class _RowGroupSplit(InputPartition):
        def __init__(self, path: str, row_group: int):
            self.path = path
            self.row_group = row_group

    class _DocsReader(DataSourceReader):
        COLUMNS = ["doc_id", "lang", "n_chars"]

        def __init__(self, options):
            self._path = options["path"]

        def partitions(self):
            # Driver-side split planning: metadata-only footer read, one
            # split per row group (the native parquet scan's granularity).
            import pyarrow.parquet as pq

            n = pq.ParquetFile(self._path).num_row_groups
            return [_RowGroupSplit(self._path, rg) for rg in range(n)]

        def read(self, partition):
            # Executor-side: stream the split's Arrow batches. Projection
            # is explicit — a custom connector must prune columns itself;
            # nothing upstream can reach inside its format.
            import pyarrow.parquet as pq

            table = pq.ParquetFile(partition.path).read_row_group(
                partition.row_group, columns=self.COLUMNS
            )
            yield from table.to_batches()

    class _DocsSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "docs_pyarrow"

        def schema(self) -> str:
            return "doc_id bigint, lang string, n_chars bigint"

        def reader(self, schema):
            return _DocsReader(self.options)

    spark.dataSource.register(_DocsSource)
    docs = spark.read.format("docs_pyarrow").option("path", path).load()
    return (
        docs.filter(F.col("n_chars") >= 200)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
