"""Page fence kernel tests (lib/page-fence.ts semantics)."""

import pytest

from kiwi_spark.functions.page_fence import (
    extract_page_fences,
    render_page_fence,
    strip_page_fences,
    to_page_aware_chunks,
)


def test_render_and_extract():
    assert render_page_fence(3) == ":::PAGE-3:::"
    with pytest.raises(ValueError):
        render_page_fence(0)
    fences = extract_page_fences("a :::PAGE-1::: b :::PAGE-2::: c")
    assert [(f.page, f.index) for f in fences] == [(1, 2), (2, 17)]


def test_strip_standalone_and_inline():
    text = "intro\n:::PAGE-1:::\nbody one\nmid :::PAGE-2::: tail\n\n\n\nend  \n"
    out = strip_page_fences(text)
    assert ":::PAGE" not in out
    assert "mid  tail" in out
    assert "\n\n\n" not in out
    assert not out.endswith(" ")


def test_page_aware_chunks_span_and_carry():
    chunks = to_page_aware_chunks(
        [
            "no fences yet",
            ":::PAGE-1:::\nfirst page text",
            "continues on page one",
            "tail of p1 :::PAGE-2::: start of p2",
            ":::PAGE-3:::",  # fence-only chunk: skipped, page carried
            "on page three",
        ]
    )
    assert chunks[0] == {"content": "no fences yet", "start_page": None, "end_page": None}
    assert chunks[1] == {"content": "first page text", "start_page": 1, "end_page": 1}
    assert chunks[2] == {"content": "continues on page one", "start_page": 1, "end_page": 1}
    assert chunks[3]["start_page"] == 1 and chunks[3]["end_page"] == 2
    assert chunks[4] == {"content": "on page three", "start_page": 3, "end_page": 3}
