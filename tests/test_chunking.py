"""Chunker tests mirroring packages/graph/src/chunking/__tests__/semantic.test.ts
fixture families (empty/short/oversized, heading splits, table integrity,
abbreviation/decimal guards, span offsets)."""

from kiwi_spark.functions.chunking import (
    _split_line_into_sentences,
    chunk_text,
    chunk_text_spans,
)
from kiwi_spark.functions.tokens import count_tokens


def test_empty_and_short_inputs():
    assert chunk_text("", 100) == []
    assert chunk_text("   \n  ", 100) == []
    assert chunk_text("Short text.", 100) == ["Short text."]


def test_oversized_input_splits():
    text = ("some words here. " * 200).strip()
    chunks = chunk_text(text, 50)
    assert len(chunks) > 1
    assert " ".join(chunks).split() == text.split()


def test_single_giant_sentence_stays_whole():
    # reference semantics: a lone unsplittable segment is emitted oversize
    # (semantic.ts chunkBySentenceOrTable with one segment)
    text = ("word " * 500).strip()
    assert chunk_text(text, 50) == [text]


def test_heading_split():
    text = "# First\n\n" + ("alpha " * 120).strip() + "\n\n# Second\n\n" + (
        "beta " * 120
    ).strip()
    chunks = chunk_text(text, 80)
    joined = "\n\n".join(chunks)
    assert len(chunks) > 1
    assert "# First" in joined and "# Second" in joined


def test_table_rows_keep_header():
    table = "| a | b |\n| --- | --- |\n" + "\n".join(
        f"| row{i} | val{i} |" for i in range(100)
    )
    chunks = chunk_text(table, 40)
    assert len(chunks) > 1
    for chunk in chunks:
        assert chunk.startswith("| a | b |\n| --- | --- |"), chunk[:60]


def test_sentence_guards():
    sents = _split_line_into_sentences(
        "Dr. Smith measured 3.14 meters. The date was 01.01.2024. Done."
    )
    assert sents == [
        "Dr. Smith measured 3.14 meters.",
        "The date was 01.01.2024. Done.",
    ]
    assert _split_line_into_sentences("1. Item one follows. 2. Item two.") == [
        "1. Item one follows.",
        "2. Item two.",
    ]
    assert _split_line_into_sentences("See z. B. this example. Next.") == [
        "See z. B. this example.",
        "Next.",
    ]
    assert _split_line_into_sentences('He said "Stop!" Then left.') == [
        'He said "Stop!"',
        "Then left.",
    ]


def test_spans_cover_chunk_content():
    # exact where the chunk text survives verbatim; whitespace-insensitive
    # mapping otherwise (span.ts:53-116)
    text = "# Head\n\n" + ("alpha beta gamma. " * 80).strip()
    spans = chunk_text_spans(text, 60)
    assert spans
    for content, start, end in spans:
        assert "".join(text[start:end].split()) == "".join(content.split())

    plain = ("one two three. " * 50).strip()
    for content, start, end in chunk_text_spans(plain, 40):
        assert plain[start:end] == content


def test_chunks_respect_max_tokens_mostly():
    text = ("one two three four five. " * 200).strip()
    for chunk in chunk_text(text, 50):
        # single segments larger than max can exceed; sentence-sized here
        assert count_tokens(chunk) <= 50


def test_tiny_chunk_merge():
    # a heading alone is < 5% of 100 tokens → merged with neighbour
    text = "# H\n\n" + ("word " * 300).strip()
    chunks = chunk_text(text, 100)
    assert all(count_tokens(c) > 5 or len(chunks) == 1 for c in chunks)


def test_ws_norm_table_is_compact_and_cache_is_small():
    """ADVICE r3: the fuzzy-find index map must be a compact typed array
    (not per-char Python ints) and the per-text cache must stay tiny —
    8 cached multi-MB docs of boxed ints pinned 100s of MB per worker."""
    from array import array

    from kiwi_spark.functions.chunking import _ws_norm_table

    _ws_norm_table.cache_clear()
    norm, index_map = _ws_norm_table("hello   world\n\tfoo")
    assert norm == "hello world foo"
    assert isinstance(index_map, array) and index_map.typecode == "q"
    assert list(index_map[:6]) == [0, 1, 2, 3, 4, 5]   # 'hello' + run start
    assert _ws_norm_table.cache_info().maxsize <= 2
