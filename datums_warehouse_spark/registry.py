"""Query registry — the machine-checkable operator inventory.

Every operator from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes the registry to
the driver, which compares Spark vs DuckDB results (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


_REGISTRY: dict[str, Query] = {}

# Modules whose import registers queries (decorator side effect).
_MODULES = (
    "datums_warehouse_spark.operators.candles",
    "datums_warehouse_spark.operators.relational",
    "datums_warehouse_spark.operators.joins",
    "datums_warehouse_spark.operators.aggregates",
    "datums_warehouse_spark.operators.windows",
    "datums_warehouse_spark.operators.sort_set",
    "datums_warehouse_spark.operators.timeseries",
    "datums_warehouse_spark.operators.composite",
    "datums_warehouse_spark.functions.scalars",
    "datums_warehouse_spark.functions.udf_surface",
    "datums_warehouse_spark.llm.dedup",
    "datums_warehouse_spark.llm.similarity",
    "datums_warehouse_spark.llm.text",
    "datums_warehouse_spark.llm.multimodal",
    "datums_warehouse_spark.sources.sinks",
    "datums_warehouse_spark.streaming.batch_equiv",
)

_loaded = False


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a graded query under ``name``.

    ``oracle`` is DuckDB SQL over the pre-registered views; ``None`` means
    the driver applies its weaker rows-only check (reserved for genuinely
    non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, Query]:
    load_all()
    return dict(_REGISTRY)


def query_map() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
