"""Cross-document FUZZY linking vs a brute-force global oracle.

The production path is star-edge blocking + distributed CC
(operators.link, fuzzy mode). The oracle here is the naive global
O(n²) union-find over the pairwise predicate — if blocking were lossy or
CC wrong, the partitions would differ."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from kiwi_spark.functions.linking import are_duplicates, union_find_groups
from kiwi_spark.operators.build_graph import build_graph
from kiwi_spark.operators.extract_text import extract_text
from kiwi_spark.operators.link import entity_id_map
from kiwi_spark.sources.pages import pages_df


@pytest.fixture(scope="module")
def doc_entities(spark):
    pages = pages_df(spark, 40, seed=33, partitions=4)
    text = extract_text(pages).where(F.col("error_code").isNull())
    nodes_doc, _, _ = build_graph(text)
    rows = nodes_doc.select("entity_id", "name", "type").collect()
    id_map = {
        r["entity_id"]: r["canonical_id"]
        for r in entity_id_map(
            nodes_doc.select("entity_id", "name", "type"), mode="fuzzy"
        ).collect()
    }
    return rows, id_map


def test_fuzzy_linking_matches_global_union_find(doc_entities):
    rows, id_map = doc_entities
    n = len(rows)
    assert n > 50
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if are_duplicates(
                rows[i]["name"], rows[i]["type"], rows[j]["name"], rows[j]["type"]
            ):
                pairs.append((i, j))
    roots = union_find_groups(pairs, n)

    expected_groups = defaultdict(set)
    for i in range(n):
        expected_groups[roots[i]].add(rows[i]["entity_id"])
    expected_partition = {frozenset(g) for g in expected_groups.values()}

    got_groups = defaultdict(set)
    for eid, canonical in id_map.items():
        got_groups[canonical].add(eid)
    got_partition = {frozenset(g) for g in got_groups.values()}

    assert got_partition == expected_partition

    # canonical id is the group minimum (L12 first_value(id ASC) semantics)
    for canonical, members in got_groups.items():
        assert canonical == min(members)


def test_verify_pairs_rejects_poisoned_candidates(spark):
    """The vectorized verification layer must drop candidate pairs that an
    over-generating blocking key could produce but the predicate rejects."""
    from kiwi_spark.operators.link import verify_pairs

    nodes = spark.createDataFrame(
        [
            ("e1", "APPLE", "ORGANIZATION"),
            ("e2", "APPLE INC", "ORGANIZATION"),
            ("e3", "ORANGE LLC", "ORGANIZATION"),
            ("e4", "ALICE SMITH", "PERSON"),
            ("e5", "ALICE JONES", "PERSON"),
        ],
        "entity_id string, name string, type string",
    )
    pairs = spark.createDataFrame(
        [("e1", "e2"), ("e1", "e3"), ("e4", "e5")], "u string, v string"
    )
    got = {(r["u"], r["v"]) for r in verify_pairs(pairs, nodes).collect()}
    assert got == {("e1", "e2")}
