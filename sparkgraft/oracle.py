"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares each ``queries()`` result against ``oracle_sql()`` on
three axes: row count, schema, order-insensitive value hash
(``__spark_entry__.py`` docstring). This module reproduces that check so
dialect-parity bugs (SURVEY.md §5.3) are caught before the driver runs.

Canonicalization is STRICT, mirroring the driver's exact value hash
(round-1 lesson: the driver distinguishes 740 from 740.0 — Spark floor()
is BIGINT, DuckDB's is DOUBLE — so any leniency here lets a red row
through). Floats are compared at full precision via shortest round-trip
repr with int-vs-float preserved; queries must do any tolerance-rounding
IN the query on BOTH sides. Timestamps are truncated to microseconds
(Spark's physical precision). Rows are compared as a multiset so result
order never matters.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd

from .catalog import TABLES, path_for


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
    if isinstance(v, float):  # np.float64 subclasses float; bools don't reach here
        if math.isnan(v):
            return "NULL"
        # shortest round-trip repr: exact, and 740.0 stays "740.0" — the
        # driver's hash distinguishes int from integral float, so must we.
        return repr(float(v))
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.floor("us").isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # Complex-typed cells crash the driver's canonicalizer outright
        # (pandas factorize: "unhashable type: 'list'") — queries must
        # serialize arrays to strings at the surface; flag loudly here.
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
    for pdf, side in ((spark_pdf, "spark"), (oracle_pdf, "oracle")):
        if len(pdf):
            first = pdf.iloc[0]
            for c in pdf.columns:
                v = first[c]
                if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
                    problems.append(
                        f"driver-unhashable complex column {side}.{c} "
                        f"({type(v).__name__}) — serialize to string at the query surface"
                    )
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
