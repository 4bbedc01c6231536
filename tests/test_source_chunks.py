"""Ports of lib/__tests__/source-chunk.test.ts (C9, incl. <image id,key>)."""

from __future__ import annotations

import json

from kiwi_spark.functions.source_chunks import (
    DEFAULT_SOURCE_CHUNK_TOKENS,
    create_source_chunks,
)


def test_text_chunks_default_target():
    text = " ".join(
        f"word{i}." for i in range(DEFAULT_SOURCE_CHUNK_TOKENS + 80)
    )
    chunks = create_source_chunks(text, start_page=2, end_page=2)
    assert len(chunks) > 1
    assert all(c["type"] == "text" for c in chunks)
    assert chunks[0]["id"] == 1
    assert chunks[0]["start_page"] == 2 and chunks[0]["end_page"] == 2
    joined = " ".join(c["text"] for c in chunks)
    assert "word0" in joined
    assert f"word{DEFAULT_SOURCE_CHUNK_TOKENS + 79}" in joined


def test_embedded_image_tags_indivisible():
    content = "\n".join(
        [
            "Before text.",
            '<image id="img-1" key="graphs/g-1/f-1.pdf/f-1/images/img-1.png">Chart &lt;A&gt;</image>',
            "After text.",
        ]
    )
    chunks = create_source_chunks(content, start_page=3, end_page=3)
    assert [
        (c["id"], c["type"], c["text"], c["image_id"], c["image_key"])
        for c in chunks
    ] == [
        (1, "text", "Before text.", None, None),
        (2, "image", "Chart <A>", "img-1",
         "graphs/g-1/f-1.pdf/f-1/images/img-1.png"),
        (3, "text", "After text.", None, None),
    ]
    assert all(c["start_page"] == 3 and c["end_page"] == 3 for c in chunks)


def test_json_unit_one_structured_chunk():
    content = json.dumps(
        {
            "records": [
                {"id": i, "label": f"record-{i}"}
                for i in range(DEFAULT_SOURCE_CHUNK_TOKENS + 80)
            ]
        },
        indent=2,
    )
    chunks = create_source_chunks(content, file_type="json")
    assert len(chunks) == 1
    assert chunks[0]["type"] == "text"
    assert chunks[0]["text"] == content
    assert chunks[0]["start_page"] is None


def test_sheet_unit_one_structured_chunk():
    content = "\n".join(
        f"| {i} | value |" for i in range(DEFAULT_SOURCE_CHUNK_TOKENS + 80)
    )
    chunks = create_source_chunks(content, file_type="sheet")
    assert len(chunks) == 1
    assert chunks[0]["text"] == content


def test_kernel_units_carry_image_source_chunks():
    """process_document: a unit containing an <image> tag yields an image
    source chunk with id/key, flanked by text chunks with true offsets."""
    from kiwi_spark.functions.docproc import process_document

    text = (
        "Before the figure there is some text.\n\n"
        '<image id="img-9" key="k/img-9.png">A bar chart</image>\n\n'
        "After the figure there is more text."
    )
    doc = process_document("https://example.test/img", text, units_only=True)
    chunks = [sc for u in doc.units for sc in u["source_chunks"]]
    images = [sc for sc in chunks if sc["type"] == "image"]
    assert len(images) == 1
    assert images[0]["image_id"] == "img-9"
    assert images[0]["image_key"] == "k/img-9.png"
    assert images[0]["text"] == "A bar chart"
    texts = [sc for sc in chunks if sc["type"] == "text"]
    assert texts and all(sc["image_id"] is None for sc in texts)
    # offsets index into the unit content
    unit = doc.units[0]
    for sc in unit["source_chunks"]:
        if sc["type"] == "text":
            assert unit["content"][sc["start_offset"]:sc["end_offset"]] == sc["text"]


def test_top_level_image_file_types():
    for ft in ("image", "image/png", "BMP"):
        chunks = create_source_chunks("A photo of a receipt.", file_type=ft)
        assert chunks == [
            {
                "id": 1,
                "type": "image",
                "text": "A photo of a receipt.",
                "image_id": None,
                "image_key": None,
                "start_page": None,
                "end_page": None,
            }
        ]


def test_process_document_honours_should_split_rule():
    """ADVICE r2: the pipeline's source-chunk boundaries must apply the C9
    should-split rule (source-chunk.ts:7/87-89): splittable types (text,
    pdf, doc…) split at 150 tokens; html/json/structured units stay ONE
    chunk per text region."""
    from kiwi_spark.functions.docproc import process_document

    long_text = " ".join(f"Sentence number {i} has several words in it." for i in range(120))
    # text → splits at 150 tokens
    doc = process_document("u://t", long_text, units_only=True, file_type="text")
    n_text_chunks = sum(len(u["source_chunks"]) for u in doc.units)
    assert n_text_chunks > 1
    # html (the flagship corpus type) → one source chunk per unit
    doc = process_document("u://h", long_text, units_only=True, file_type="html")
    for unit in doc.units:
        assert len(unit["source_chunks"]) == 1
        assert unit["source_chunks"][0]["text"] == unit["content"].strip()
    # json → one chunk per unit as well
    doc = process_document("u://j", long_text, units_only=True, file_type="json")
    for unit in doc.units:
        assert len(unit["source_chunks"]) == 1


def test_process_document_image_tags_with_nonsplittable_type():
    """Image tags stay indivisible image chunks and surrounding text regions
    stay whole for non-splittable types."""
    from kiwi_spark.functions.docproc import process_document

    text = (
        "Intro paragraph here. "
        '<image id="im1" key="k1">A chart of revenue</image>'
        " Closing paragraph."
    )
    doc = process_document("u://img", text, units_only=True, file_type="html")
    chunks = doc.units[0]["source_chunks"]
    types = [c["type"] for c in chunks]
    assert types == ["text", "image", "text"]
    assert chunks[1]["image_id"] == "im1" and chunks[1]["image_key"] == "k1"
    assert chunks[0]["text"] == "Intro paragraph here."
    assert chunks[2]["text"] == "Closing paragraph."
