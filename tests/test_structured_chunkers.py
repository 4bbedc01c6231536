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
    # single.ts: verbatim, even when empty (loader/__tests__/single cases)
    assert chunk_single("hello\nworld") == ["hello\nworld"]
    assert chunk_single("") == [""]


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
    # each chunk is a pretty-printed JSON array slice; order preserved
    recs = [r for c in chunks for r in json.loads(c)]
    assert [r["k"] for r in recs] == list(range(40))


def test_json_reference_cases():
    """Ported from chunking/__tests__/json.test.ts."""
    assert chunk_json("", 100) == []
    small = '{"name":"Alice","age":30}'
    assert chunk_json(small, 100) == [small]
    # splits large top-level objects preserving document key order
    doc = '{"zebra":"' + "a " * 30 + '","alpha":"' + "b " * 30 + '","middle":"' + "c " * 30 + '"}'
    chunks = chunk_json(doc, 40)
    assert len(chunks) == 3
    assert '"zebra"' in chunks[0]
    assert '"alpha"' in chunks[1]
    assert '"middle"' in chunks[2]
    # path prefixes for recursively split nested values
    nested = json.dumps({"data": {"a": "x" * 120, "b": "y" * 120}})
    chunks = chunk_json(nested, 20)
    assert len(chunks) > 1
    assert all(c.startswith("Path: $.data") for c in chunks)
    # invalid json falls back to a single chunk
    bad = "{not valid json: [}"
    assert chunk_json(bad, 10) == [bad]
    # JSONC: comments + trailing commas normalized
    jsonc = '{\n// note\n"a": "' + "x " * 10 + '",\n"b": "' + "y " * 10 + '",\n}'
    chunks = chunk_json(jsonc, 20)
    assert len(chunks) == 2
    assert '"a"' in chunks[0] and '"b"' in chunks[1]


def test_csv_reference_cases():
    """Ported from chunking/__tests__/csv.test.ts."""
    import pytest

    assert chunk_csv("", 100) == []
    assert chunk_csv("name,age,email", 100) == ["name,age,email"]
    # splits only between complete quoted rows
    doc = 'id,note\n1,"first line\nsecond line"\n2,next'
    assert chunk_csv(doc, 4) == ['id,note\n1,"first line\nsecond line"', "id,note\n2,next"]
    # rejects malformed quoted rows
    from kiwi_spark.functions.chunkers_structured import CSVParseError

    with pytest.raises(CSVParseError):
        chunk_csv('id,note\n1,"unterminated', 100)
    # keeps an oversized row intact
    long_value = " ".join(f"word{i}" for i in range(50))
    doc = f"id,description\n1,{long_value}\n2,short"
    assert chunk_csv(doc, 4) == [f"id,description\n1,{long_value}", "id,description\n2,short"]
    # no header → first row not duplicated
    assert chunk_csv("1,Alice\n2,Bob\n3,Charlie", 1) == ["1,Alice", "2,Bob", "3,Charlie"]


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
