"""Regression tests pinning the STRICT comparator contract (round-2 fix).

Round 1 lesson (VERDICT.md): the driver's value hash distinguishes 740
from 740.0 and crashes outright on list-typed cells, while the local
comparator rounded floats and collapsed integral floats to ints — so
four queries passed preflight and failed the driver. These tests make
that leniency impossible to reintroduce.
"""

from __future__ import annotations

import pandas as pd

from sparkgraft.oracle import _canon_value, compare_frames


def test_int_vs_float_distinct():
    # the exact fn_math failure: Spark floor() BIGINT vs DuckDB DOUBLE
    assert _canon_value(740) != _canon_value(740.0)
    assert _canon_value(740) == "740"
    assert _canon_value(740.0) == "740.0"


def test_no_rounding():
    # 9th-decimal differences must be visible, not forgiven
    assert _canon_value(0.1234567891) != _canon_value(0.1234567892)


def test_float_repr_is_shortest_roundtrip():
    assert _canon_value(0.1) == "0.1"
    assert float(_canon_value(1.0000000001)) == 1.0000000001


def test_complex_columns_flagged():
    # the agg_collect_sorted / fn_array_ops / fn_array_lambda /
    # text_inverted_index failure: driver canonicalizer can't hash lists
    spark_pdf = pd.DataFrame({"k": [1], "v": [[1, 2, 3]]})
    oracle_pdf = pd.DataFrame({"k": [1], "v": [[1, 2, 3]]})
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert any("driver-unhashable" in p for p in problems)


def test_scalar_frames_still_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]})  # order-insensitive
    assert compare_frames(a, b) == []


def test_dtype_split_fails():
    a = pd.DataFrame({"k": [1, 2]})          # int64
    b = pd.DataFrame({"k": [1.0, 2.0]})      # float64 (e.g. DuckDB HUGEINT sum)
    assert compare_frames(a, b) != []
