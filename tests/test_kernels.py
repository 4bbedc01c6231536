"""Unit tests for the remaining pure kernels: extraction grammar, ids,
tokens, excerpt, catalog."""

import pytest

from kiwi_spark.functions.extract_grammar import (
    PREDICATES,
    classify_entity,
    extract_sentence,
    find_entity_spans,
)
from kiwi_spark.functions.ids import stable_id
from kiwi_spark.functions.tokens import count_tokens, count_tokens_uncached
from kiwi_spark.operators.extract_text import build_excerpt


def test_classify_entity_families():
    assert classify_entity("ACME INC") == "ORGANIZATION"
    assert classify_entity("ACME & FALCON") == "ORGANIZATION"
    assert classify_entity("ACME AND FALCON") == "ORGANIZATION"
    assert classify_entity("MASSIVEDYNAMIC") == "ORGANIZATION"  # compact
    assert classify_entity("MD") == "ORGANIZATION"  # acronym-shaped
    assert classify_entity("ALICE MARIE SMITH") == "PERSON"
    assert classify_entity("BERLIN") == "LOCATION"
    assert classify_entity("MARCH 3, 2025") == "DATE"
    assert classify_entity("FACT: MONTHLY RENT") == "FACT"
    assert classify_entity("BERLIN SUMMIT") == "EVENT"
    assert classify_entity("THROUGHPUT") == "CONCEPT"
    assert classify_entity("ODYSSEY") == "CREATIVE_WORK"
    assert classify_entity("T") is None  # single capital letter
    assert classify_entity("NOTAWORD QQQQ") is None


def test_extract_sentence_triple():
    spans, rel = extract_sentence("ALICE SMITH works at ACME INC.")
    assert [(s[0], s[1]) for s in spans] == [
        ("ALICE SMITH", "PERSON"),
        ("ACME INC", "ORGANIZATION"),
    ]
    assert rel == ("ALICE SMITH", "works at", "ACME INC", PREDICATES["works at"])

    # no predicate → no relationship
    _, rel2 = extract_sentence("Analysts praised ACME INC yesterday.")
    assert rel2 is None

    # predicate with non-entity around it → no relationship
    _, rel3 = extract_sentence("Someone works at a bakery.")
    assert rel3 is None


def test_find_entity_spans_overlap_priority():
    # FACT and DATE take priority over the generic caps-run
    spans = find_entity_spans("FACT: MONTHLY RENT was set on MARCH 3, 2025.")
    kinds = {s[1] for s in spans}
    assert kinds == {"FACT", "DATE"}


def test_stable_id_deterministic():
    a = stable_id("url", "u", 0)
    assert a == stable_id("url", "u", 0)
    assert a != stable_id("url", "u", 1)
    assert len(a) == 16
    # separator prevents ambiguity
    assert stable_id("ab", "c") != stable_id("a", "bc")


def test_token_counts_monotone_and_cached():
    assert count_tokens_uncached("") == 0
    assert count_tokens_uncached("   ") == 0
    small = count_tokens_uncached("one two three")
    bigger = count_tokens_uncached("one two three four five six")
    assert 0 < small < bigger
    assert count_tokens("hello world") == count_tokens_uncached("hello world")


def test_build_excerpt():
    short = "one two three"
    assert build_excerpt(short, limit=250) == short
    words = " ".join(f"w{i}" for i in range(600))
    excerpt = build_excerpt(words, limit=250)
    assert excerpt.startswith("w0 ") and excerpt.endswith(" w599")
    assert " … " in excerpt
    assert len(excerpt.split()) == 501


def test_catalog_crash_safety(spark, tmp_path):
    """A half-written snapshot dir (crash before manifest flip) must stay
    invisible — readers keep seeing the last committed snapshot."""
    import os

    from kiwi_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.commit(spark.range(5), "t")
    # simulate a crashed writer: data dir exists, manifest never flipped
    partial = tmp_path / "wh" / "t" / "snap-00002"
    partial.mkdir(parents=True)
    (partial / "part-zzz.parquet.tmp").write_bytes(b"garbage")
    assert cat.read(spark, "t").count() == 5
    snap = cat.commit(spark.range(7), "t")
    # next commit does not collide with the orphan dir
    assert snap["dir"] != "snap-00002" or os.path.exists(cat.path("t"))
    assert cat.read(spark, "t").count() == 7


def test_catalog_snapshots(spark, tmp_path):
    from kiwi_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df1 = spark.range(5)
    snap1 = cat.commit(df1, "t")
    assert snap1["id"] == 1
    assert cat.read(spark, "t").count() == 5
    snap2 = cat.commit(spark.range(9), "t")
    assert snap2["id"] == 2
    assert cat.read(spark, "t").count() == 9  # reader sees latest snapshot
    assert cat.tables() == ["t"]
    cat.drop("t")
    assert not cat.exists("t")
    with pytest.raises(FileNotFoundError):
        cat.path("t")
