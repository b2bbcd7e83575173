"""Order-insensitive result comparison between Spark and the DuckDB oracle.

Mirrors (conservatively) the driver's check: row-count + column names +
order-insensitive value comparison with columns sorted by name. Values are
canonicalized to strings strictly — if this comparison passes, any
reasonable hash the driver computes will match too.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0.0:
            return "0.0"  # fold -0.0
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        return _canon_value(f)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "∅"
        # compare at microsecond precision (Spark's ceiling)
        return v.floor("us").isoformat()
    if isinstance(v, datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(x)}" for k, x in sorted(v.items())) + "}"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def _driver_unhashable_cols(df: pd.DataFrame) -> list[str]:
    """Columns whose cells the driver's pandas-based canonicalizer cannot
    sort/hash (list/ndarray/dict). Round 1 proof: a11_collect_list returned
    an array column and the driver crashed with `unhashable type: 'list'`
    instead of grading it — such columns must be joined to scalars first."""
    bad = []
    for col in df.columns:
        head = df[col].head(20)
        if any(
            isinstance(v, (list, dict)) or type(v).__name__ == "ndarray" for v in head
        ):
            bad.append(col)
    return bad


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    bad = _driver_unhashable_cols(spark_pdf)
    if bad:
        return CompareResult(
            name, False, f"driver-unhashable (list/dict/ndarray) columns: {bad}"
        )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return CompareResult(name, False, f"schema mismatch: spark={s_cols} oracle={o_cols}")
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            name, False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = []
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if a != b:
                diffs.append(f"  row[{i}] spark={a} oracle={b}")
                if len(diffs) >= 5:
                    break
        return CompareResult(name, False, "value mismatch:\n" + "\n".join(diffs))
    return CompareResult(name, True)
