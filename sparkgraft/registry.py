"""Central query registry.

Every operator module registers its queries here with the ``@query``
decorator; ``__spark_entry__`` simply re-exports the merged dicts, so each
new operator auto-registers with the driver contract (SURVEY.md §7.1).

A registered callable has signature ``(spark, sf_dir) -> DataFrame``.
``oracle`` is the DuckDB-dialect ANSI SQL twin; ``None`` marks a genuinely
non-SQL-expressible op (streaming/state/approximate) that gets the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``, optionally with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco
