from datums_warehouse_spark.sources.tables import TABLES, load

__all__ = ["TABLES", "load"]
