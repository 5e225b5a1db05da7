"""Shared in-key proof primitives (r13 optimization round).

`multisets_equal` replaces the double ``a.exceptAll(b) … b.exceptAll(a)``
frame-equality probe the index/feed keys use. The double probe costs two
full shuffles AND evaluates each side twice (the heavy side is usually an
uncached rebuild — minhash over the live corpus, a frozen ANN
re-assignment); the signed-count form computes the symmetric difference
in ONE pass: tag each side ±1, group by every column, and any group whose
signed count is non-zero is a multiset mismatch. Semantics match
exceptAll-in-both-directions exactly (value equality with SQL
NaN/-0.0 normalization, NULLs equal as group keys — the same equality
exceptAll uses), so a proof that raised before still raises.

Guide §2.3/§2.4 (shuffle fewer bytes, remove duplicate passes): one
Exchange over |a|+|b| tagged rows instead of two exceptAll Exchanges,
and each input subtree evaluates once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIGN = "_sg_ms_sign"
_DIFF = "_sg_ms_diff"


def multisets_equal(a: DataFrame, b: DataFrame) -> bool:
    """True iff frames ``a`` and ``b`` are equal as multisets of rows
    (same rows with the same duplicities) — i.e. both
    ``a.exceptAll(b)`` and ``b.exceptAll(a)`` are empty — checked in a
    single signed-count pass. Columns are matched by ``a``'s order."""
    cols = a.columns
    tagged = a.select(*cols).withColumn(_SIGN, F.lit(1)).unionByName(
        b.select(*cols).withColumn(_SIGN, F.lit(-1))
    )
    mismatched = (
        tagged.groupBy(*cols)
        .agg(F.sum(_SIGN).alias(_DIFF))
        .filter(F.col(_DIFF) != 0)
    )
    return mismatched.limit(1).count() == 0
