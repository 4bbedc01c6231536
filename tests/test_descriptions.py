"""L14 description fold — chunk grouping ported from description.ts:16-36
(test fixtures mirror the reference's chunking rules exactly)."""

from __future__ import annotations

from kiwi_spark.functions.descriptions import (
    DESCRIPTION_MAX_CHARS,
    chunk_description_sources,
    fold_description,
)


def test_chunk_grouping_reference_rules():
    assert chunk_description_sources([]) == []
    # ≤300 → one chunk
    assert chunk_description_sources(["d"] * 300) == [["d"] * 300]
    # tail ≤ 25 merges into the previous chunk
    got = chunk_description_sources([str(i) for i in range(310)])
    assert [len(c) for c in got] == [310]
    assert got[0][-1] == "309"
    # tail > 25 stays separate
    got = chunk_description_sources([str(i) for i in range(350)])
    assert [len(c) for c in got] == [300, 50]
    # multi-chunk with merged tail: 625 = 300 + 300 + 25 → 300 + 325
    got = chunk_description_sources([str(i) for i in range(625)])
    assert [len(c) for c in got] == [300, 325]
    # order preserved across the boundary
    assert got[1][0] == "300" and got[1][-1] == "624"


def test_fold_is_order_stable_and_deterministic():
    sources = [f"desc {i} about entity" for i in range(40)]
    a = fold_description(sources)
    b = fold_description(sources)
    assert a == b
    assert a.startswith("desc 0 about entity desc 1")
    # a different order → a different (but deterministic) fold
    assert fold_description(list(reversed(sources))) != a


def test_fold_normalizes_whitespace_and_caps():
    assert fold_description(["  a   b ", "c\n\nd"]) == "a b c d"
    long_sources = ["word " * 200] * 5
    out = fold_description(long_sources)
    assert len(out) <= DESCRIPTION_MAX_CHARS
    assert not out.endswith(" ")


def test_fold_feeds_summary_forward():
    # >300 sources → two fold steps; the first summary prefixes the second
    sources = [f"s{i}" for i in range(350)]
    out = fold_description(sources)
    assert out.startswith("s0 s1 s2")


def test_fold_empty():
    assert fold_description([]) == ""
    assert fold_description([], current="keep me") == "keep me"
    assert fold_description(["x"], current="prior") == "prior x"
