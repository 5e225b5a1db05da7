"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``sparkgraft`` — every operator module registers itself
into ``sparkgraft.registry`` at import time, so this file never needs
editing as coverage widens (SURVEY.md §7.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import sparkgraft
from sparkgraft.aggregates import pricing_summary

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    return pricing_summary(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(sparkgraft.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect twin for every hash-checkable query; keys absent
    here (streaming/approximate/side-effect ops) get rows-only checks."""
    return dict(sparkgraft.ORACLE)
