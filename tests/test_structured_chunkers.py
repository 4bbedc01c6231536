"""Structured chunker tests (chunking/csv.ts, json.ts, single.ts, factory.ts)."""

import json

from kiwi_spark.functions.chunkers_structured import (
    CHUNKER_TABLE,
    chunk_csv,
    chunk_for_type,
    chunk_json,
    chunk_single,
)


def test_single():
    assert chunk_single("  whole thing  ") == ["whole thing"]
    assert chunk_single("   ") == []


def test_csv_header_reemitted():
    csv = "name,age,city\n" + "\n".join(f"person{i},{20+i},town{i}" for i in range(200))
    chunks = chunk_csv(csv, 60)
    assert len(chunks) > 1
    for chunk in chunks:
        assert chunk.startswith("name,age,city\n")
    # all rows preserved exactly once
    rows = [ln for c in chunks for ln in c.splitlines() if ln != "name,age,city"]
    assert rows == [f"person{i},{20+i},town{i}" for i in range(200)]


def test_csv_no_header():
    csv = "\n".join(f"{i},{i*2}" for i in range(100))
    chunks = chunk_csv(csv, 40)
    assert all(not c.startswith("name") for c in chunks)
    assert [ln for c in chunks for ln in c.splitlines()] == csv.splitlines()


def test_json_whole_when_fits():
    doc = json.dumps({"a": 1, "b": [1, 2, 3]})
    assert chunk_json(doc, 500) == [doc]


def test_json_array_split():
    doc = json.dumps([{"k": i, "text": "word " * 30} for i in range(40)])
    chunks = chunk_json(doc, 100)
    assert len(chunks) > 1
    recs = [json.loads(line) for c in chunks for line in c.splitlines()]
    assert [r["k"] for r in recs] == list(range(40))


def test_json_lines_split():
    doc = "\n".join(json.dumps({"i": i, "t": "tok " * 40}) for i in range(30))
    chunks = chunk_json(doc, 80)
    assert len(chunks) > 1
    recs = [json.loads(line) for c in chunks for line in c.splitlines()]
    assert [r["i"] for r in recs] == list(range(30))


def test_factory_table():
    assert CHUNKER_TABLE["html"] == ("semantic", 2000)
    assert CHUNKER_TABLE["csv"][1] == 500
    out = chunk_for_type("image", "an image placeholder")
    assert out == ["an image placeholder"]
    assert chunk_for_type("unknown-type", "plain text.") == ["plain text."]
