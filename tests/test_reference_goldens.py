"""Drive tests/goldens/reference_cases.json — expectations extracted
VERBATIM from the reference repo's own test files (html.test.ts,
span.test.ts, semantic.test.ts, single.test.ts).

The oracle side is pure data: inputs and expected outputs written by the
reference's authors. This file only maps each case's ``fn`` tag onto the
kiwi_spark implementation — if the renderer/chunker/span logic drifts from
the reference's published behavior, these fail.
"""

from __future__ import annotations

import json
import os

import pytest

from kiwi_spark.functions.chunkers_structured import chunk_single_spans
from kiwi_spark.functions.chunking import chunk_text, chunk_text_spans, resolve_spans
from kiwi_spark.functions.html_text import html_to_markdown, normalize_html

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

with open(os.path.join(GOLDENS, "reference_cases.json")) as fh:
    CASES = json.load(fh)["cases"]


def _expand_fill(case: dict) -> str:
    text = case["input"]
    for marker, (word, reps) in case.get("fill", {}).items():
        text = text.replace(marker, word * reps)
    return text


def _run_case(case: dict):
    fn = case["fn"]
    if fn == "html_to_markdown":
        out = html_to_markdown(_expand_fill(case))
        if "then_chunk" in case:
            chunks = chunk_text(out, case["then_chunk"])
            return chunks, "\n\n".join(chunks)
        return None, out
    if fn == "normalize_html":
        return None, normalize_html(case["input"])
    if fn == "semantic_chunks":
        chunks = chunk_text(case["input"], case["chunk_size"])
        return chunks, "\n".join(chunks)
    if fn == "semantic_spans":
        return chunk_text_spans(case["input"], case["chunk_size"]), None
    if fn == "resolve_spans":
        return resolve_spans(case["text"], case["chunks"]), None
    if fn == "single_spans":
        return chunk_single_spans(case["input"]), None
    raise AssertionError(f"unknown fn {fn!r}")


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["id"])
def test_reference_golden(case):
    expect = case["expect"]
    chunks, text = _run_case(case)

    if "equals" in expect:
        assert text == expect["equals"], case["source"]
    if "equals_list" in expect:
        assert chunks == expect["equals_list"], case["source"]
    if "spans" in expect:
        got = [[c, s, e] for (c, s, e) in chunks]
        assert got == expect["spans"], case["source"]
    if "min_chunks" in expect:
        assert len(chunks) >= expect["min_chunks"], case["source"]
    for needle in expect.get("contains", []):
        assert needle in text, (case["source"], needle)
    for needle in expect.get("not_contains", []):
        assert needle not in text, (case["source"], needle)
    for needle in expect.get("some_contains", []):
        assert any(needle in c for c in chunks), (case["source"], needle)
    if "first_contains" in expect:
        assert expect["first_contains"] in chunks[0], case["source"]
