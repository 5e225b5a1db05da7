"""Large-star/small-star connected components: correctness vs a
union-find reference, the forced-deep-chain round-count bound the r4
verdict asked for, and fixpoint behavior on degenerate inputs."""

from __future__ import annotations

import math
import random

import pytest

from sparkgraft.graph import connected_components


def _uf_labels(n_vertices, edges):
    """Reference: union-find min-label per component."""
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min id per component == root under min-union
    return {i: find(i) for i in range(n_vertices)}


def _run(spark, n_vertices, edges, **kw):
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges] or [(0, 0)], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "id long")
    labels, rounds = connected_components(e, v, id_col="id", **kw)
    got = {r["id"]: r["label"] for r in labels.collect()}
    return got, rounds


def test_deep_chain_converges_in_log_rounds(spark):
    # a 64-vertex path has diameter 63: min-label propagation needs 63
    # rounds; large-star/small-star must stay logarithmic. The SoCC'14
    # bound is O(log^2 n) worst case, O(log n) in practice — assert the
    # practical bound with slack: <= 3*log2(n) + 2 rounds.
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got, rounds = _run(spark, n + 4, edges)  # +4 isolated vertices
    assert rounds <= 3 * int(math.log2(n)) + 2, rounds
    for i in range(n):
        assert got[i] == 0
    for i in range(n, n + 4):
        assert got[i] == i  # isolated vertices label themselves


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]  # sparse -> many components, self-loops included on purpose
    got, _ = _run(spark, n, edges)
    assert got == _uf_labels(n, edges)


def test_reverse_ordered_chain_and_star(spark):
    # adversarial orientation: chain given high->low plus a star keyed
    # at the max id
    edges = [(i + 1, i) for i in range(30)] + [(99, j) for j in range(40, 60)]
    got, _ = _run(spark, 100, edges)
    for i in range(31):
        assert got[i] == 0
    for j in list(range(40, 60)) + [99]:
        assert got[j] == 40


def test_empty_edges_fixpoint_first_round(spark):
    got, rounds = _run(spark, 5, [(0, 0)])  # only a self-loop -> no edges
    assert rounds == 1
    assert got == {i: i for i in range(5)}


def test_round_cap_raises(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _run(spark, 40, [(i, i + 1) for i in range(39)], max_rounds=1)
