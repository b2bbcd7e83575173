"""SparkSession factory tuned for the local test harness.

The engine itself is scale-agnostic: the same plans run on a 1000-executor
cluster. These configs only pin the local-mode knobs (shuffle partition
count, Arrow transfers, UTC session time) so results are deterministic and
comparable with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def get_spark(app_name: str = "datums-warehouse-spark") -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on: runtime coalescing + skew-join handling — the same settings we
      would ship at cluster scale.
    - ``spark.sql.shuffle.partitions`` starts at 2×cores locally; AQE
      coalesces down. On a real cluster this would be sized to data volume.
    - Session timezone pinned to UTC so timestamp semantics match the DuckDB
      oracle (naive timestamps throughout the testdata).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(8, int(cpus))))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


class scoped_shuffle_partitions:
    """Temporarily clamp ``spark.sql.shuffle.partitions``.

    For stages whose data is orders of magnitude smaller than the session's
    shuffle sizing assumes — iterative loops over tiny label tables, test-
    scale streaming state stores — where a default session (200 partitions)
    pays per-partition task/state overhead for kilobytes of data. Restores
    the previous value on exit; AQE coalescing makes this a no-op for
    large stages, so it only ever removes overhead.
    """

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


class scoped_conf:
    """Temporarily set arbitrary session confs, restoring priors on exit —
    the generalized sibling of scoped_shuffle_partitions for operators that
    need a write-time knob (e.g. s12's stats-bearing timestamp encoding)
    without leaking it into the caller's session."""

    def __init__(self, spark: SparkSession, **confs: str):
        self.spark, self.confs = spark, confs

    def __enter__(self):
        self.prev = {k: self.spark.conf.get(k) for k in self.confs}
        for k, v in self.confs.items():
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.prev.items():
            self.spark.conf.set(k, v)
