"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares each ``queries()`` result against ``oracle_sql()`` on
three axes: row count, schema, order-insensitive value hash
(``__spark_entry__.py`` docstring). This module reproduces that check so
dialect-parity bugs (SURVEY.md §5.3) are caught before the driver runs.

Canonicalization choices mirror the trap list: floats are compared at 6
decimal places (queries round explicitly at or above that), timestamps are
truncated to microseconds (Spark's precision), and rows are compared as a
sorted multiset so result order never matters.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd

from .catalog import TABLES, path_for

# 9 decimals ≈ exact for money-magnitude doubles (ulp > 1e-9 there) while
# forgiving sub-nano noise on small values; queries are designed so both
# engines produce bit-identical doubles (raw IEEE arithmetic per-row,
# in-query rounding for aggregates).
_FLOAT_DECIMALS = 9


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the ten tables registered as views, exactly
    like the driver's oracle harness."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path_for(sf_dir, name)}')"
        )
    return con


def _canon_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        r = round(v, _FLOAT_DECIMALS)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return f"{r:.{_FLOAT_DECIMALS}f}".rstrip("0").rstrip(".")
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.floor("us").isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize every cell, return row tuples."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    s_rows = Counter(canonical_rows(spark_pdf))
    o_rows = Counter(canonical_rows(oracle_pdf))
    if s_rows != o_rows:
        only_s = list((s_rows - o_rows).items())[:3]
        only_o = list((o_rows - s_rows).items())[:3]
        problems.append(
            f"values differ; sample spark-only={only_s} oracle-only={only_o} (cols={s_cols})"
        )
    return problems
