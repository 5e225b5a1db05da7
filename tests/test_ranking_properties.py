"""Property tests for ranking.with_global_rank (hypothesis): the
distributed construction must equal a plain sorted row_number for any
data — heavy ties, negatives, constant keys, singletons. Boundary
placement between range buckets is where hand-written logic can break,
so that's what random data is aimed at."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkgraft.ranking import with_global_rank

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # sort value (many ties)
        st.integers(min_value=0, max_value=10_000),    # unique-ish id
    ),
    min_size=1,
    max_size=120,
    unique_by=lambda t: t[1],  # ids unique => total order deterministic
)


def _expected(rows: list[tuple[int, int]], desc: bool) -> dict[int, int]:
    ordered = sorted(rows, key=lambda t: (-t[0] if desc else t[0], t[1]))
    return {row[1]: i + 1 for i, row in enumerate(ordered)}


@pytest.mark.parametrize("direction", ["asc", "desc"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_rank_matches_plain_row_number(spark, direction, rows):
    df = spark.createDataFrame(rows, "v int, id long")
    ranked = with_global_rank(df, [("v", direction), ("id", "asc")], buckets=4)
    got = {r["id"]: r["rank"] for r in ranked.collect()}
    assert got == _expected(rows, direction == "desc")


def test_rank_constant_first_key_single_bucket(spark):
    rows = [(7, i) for i in range(50)]
    df = spark.createDataFrame(rows, "v int, id long")
    ranked = with_global_rank(df, [("v", "asc"), ("id", "asc")], buckets=4)
    got = {r["id"]: r["rank"] for r in ranked.collect()}
    assert got == {i: i + 1 for i in range(50)}


def test_rank_with_nulls_first(spark):
    rows = [(None, 1), (5, 2), (None, 3), (-5, 4)]
    df = spark.createDataFrame(rows, "v int, id long")
    ranked = with_global_rank(df, [("v", "asc"), ("id", "asc")], buckets=4)
    got = {r["id"]: r["rank"] for r in ranked.collect()}
    # asc_nulls_first: null ids 1,3 rank first, then -5, then 5
    assert got == {1: 1, 3: 2, 4: 3, 2: 4}


def test_prefix_sum_matches_single_window(spark):
    # the distributed range-bucketed prefix sum must equal the plain
    # single-partition window cumsum on the same total order
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from conftest import SF_DIR

    from sparkgraft.catalog import load
    from sparkgraft.ranking import with_global_prefix_sum

    df = (
        load(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("v")
        )
    )
    got = with_global_prefix_sum(
        df, [("v", "desc"), ("o_custkey", "asc")], value_col="v",
        out_col="ps",
    )
    w = (
        Window.orderBy(F.desc("v"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("ps", F.sum("v").over(w))
    a = {(r["o_custkey"]): str(r["ps"]) for r in got.collect()}
    b = {(r["o_custkey"]): str(r["ps"]) for r in want.collect()}
    assert a == b


def test_bounds_cache_is_corpus_namespaced(spark):
    # Two corpora with the same cache label must never share boundary
    # entries (sharing would produce wrong ranks, not slow ones), and a
    # bare label without a corpus identity must be rejected outright.
    from sparkgraft import ranking
    from sparkgraft.ranking import with_global_prefix_sum

    a = spark.createDataFrame([(v, v) for v in range(100)], "v int, id long")
    b = spark.createDataFrame(
        [(v * 1000, v) for v in range(100)], "v int, id long"
    )
    before = {k for k in ranking._BOUNDS_CACHE if k[1] == "t"}
    assert not before
    ra = with_global_rank(
        a, [("v", "asc"), ("id", "asc")], cache_key="t", corpus="corpusA"
    )
    rb = with_global_rank(
        b, [("v", "asc"), ("id", "asc")], cache_key="t", corpus="corpusB"
    )
    assert ("corpusA", "t") in ranking._BOUNDS_CACHE
    assert ("corpusB", "t") in ranking._BOUNDS_CACHE
    assert (
        ranking._BOUNDS_CACHE[("corpusA", "t")]
        != ranking._BOUNDS_CACHE[("corpusB", "t")]
    )
    # both still rank correctly with their own boundaries
    assert {r["id"]: r["rank"] for r in ra.collect()} == {
        i: i + 1 for i in range(100)
    }
    assert {r["id"]: r["rank"] for r in rb.collect()} == {
        i: i + 1 for i in range(100)
    }
    with pytest.raises(ValueError):
        with_global_rank(a, [("v", "asc"), ("id", "asc")], cache_key="bare")
    with pytest.raises(ValueError):
        with_global_prefix_sum(
            a, [("v", "asc"), ("id", "asc")], value_col="v",
            cache_key="bare",
        )
    for k in [("corpusA", "t"), ("corpusB", "t")]:
        ranking._BOUNDS_CACHE.pop(k, None)
