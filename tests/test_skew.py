"""salted_agg must equal plain groupBy exactly, for every supported
aggregate, including null handling and single-row groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR
from sparkgraft.skew import salted_agg


def test_salted_equals_plain_on_lineitem(spark):
    li = sparkgraft.load(spark, SF_DIR, "lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            ("count", "l_orderkey", "n"),
            ("min", "l_quantity", "qlo"),
            ("max", "l_quantity", "qhi"),
        ],
        salt_buckets=8,
    )
    plain = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("l_orderkey").alias("n"),
        F.min("l_quantity").alias("qlo"),
        F.max("l_quantity").alias("qhi"),
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_sum_avg_match_to_rounding(spark):
    li = sparkgraft.load(spark, SF_DIR, "lineitem")
    salted = {
        r["l_returnflag"]: (r["s"], r["m"])
        for r in salted_agg(
            li, ["l_returnflag"],
            [("sum", "l_extendedprice", "s"), ("avg", "l_extendedprice", "m")],
        ).collect()
    }
    plain = {
        r["l_returnflag"]: (r["s"], r["m"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("s"), F.avg("l_extendedprice").alias("m"))
        .collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][0] == pytest.approx(plain[k][0], rel=1e-12)
        assert salted[k][1] == pytest.approx(plain[k][1], rel=1e-12)


def test_salted_rejects_non_algebraic(spark):
    li = sparkgraft.load(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], [("median", "l_quantity", "x")])
