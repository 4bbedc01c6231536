"""Distributed CC (large-star/small-star) vs a trivial driver union-find."""

import random

import pytest

from kiwi_spark.functions.linking import union_find_groups
from kiwi_spark.operators.link import connected_components


def _expected_components(edges, nodes):
    index = {n: i for i, n in enumerate(nodes)}
    roots = union_find_groups([(index[u], index[v]) for u, v in edges], len(nodes))
    comp = {}
    for node, i in index.items():
        members = [n for n, j in index.items() if roots[j] == roots[i]]
        comp[node] = min(members)
    return comp


@pytest.mark.parametrize("seed,n,m", [(1, 30, 25), (2, 50, 80), (3, 12, 4)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    nodes = [f"n{idx:04d}" for idx in range(n)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(m)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    expected = _expected_components(edges, nodes)
    touched = {u for e in edges for u in e}
    for node in touched:
        assert got.get(node, node) == expected[node], node
    # long path / star / two cliques
    path = [(f"p{i}", f"p{i+1}") for i in range(20)]
    dfp = spark.createDataFrame(path, ["u", "v"])
    gotp = {r["id"]: r["component"] for r in connected_components(dfp).collect()}
    assert all(c == "p0" for c in gotp.values())
