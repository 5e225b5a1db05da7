"""Smoke tests mirroring the driver's entry() check."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]


def test_every_query_has_callable_and_contract(spark):
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    for key in osql:
        assert key in qs, f"oracle for unregistered key {key}"
