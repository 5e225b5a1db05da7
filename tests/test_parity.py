"""Oracle-parity tests: every registered query with oracle SQL must match
DuckDB on row count + columns + order-insensitive values at sf0.001 —
the same three axes the driver checks at sf0.01 (SURVEY.md §5.2).

Parametrized over the registry, so each new operator module gets its
parity test for free.
"""

from __future__ import annotations

import pytest

import sparkgraft
from sparkgraft.oracle import compare_frames

from conftest import SF_DIR


def _keys():
    import sparkgraft  # modules register on import

    return sorted(sparkgraft.QUERIES)


@pytest.mark.parametrize("key", _keys())
def test_parity(key, spark, oracle_con):
    spark_pdf = sparkgraft.QUERIES[key](spark, SF_DIR).toPandas()
    oracle = sparkgraft.ORACLE.get(key)
    if oracle is None:
        pytest.skip(f"{key}: rows-only (no oracle SQL); covered by invariant tests")
    oracle_pdf = oracle_con.execute(oracle).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{key}: " + "; ".join(problems)
