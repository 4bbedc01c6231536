"""Semantic chunker — pure-Python port of the reference's recursive splitter.

Semantics from packages/graph/src/chunking/semantic.ts (all line refs there):

* three split levels: double-empty-lines (:289-332) → markdown headings
  (:334-371) → sentence/table segments (:186-238, 373-501)
* greedy re-packing with "\\n\\n" joins (:135-172, joinChunkParts :274-287)
* tiny-chunk merge: chunks under 5% of max merge into neighbours (:240-273)
* sentence boundary guards: decimal/date dots, numeric listings,
  abbreviations incl. single-letter initials (:607-749)
* markdown tables: header+delimiter detection, each body row a TableRow
  segment carrying its header, header re-emitted when a chunk starts
  mid-table (:373-459, buildChunkText :503-545)

Token counting uses kiwi_spark.functions.tokens (deterministic o200k
substitute — see that module's docstring). Chunk spans are located in the
original text per chunking/span.ts:3-25 (exact indexOf from cursor with a
trimmed fallback).
"""

from __future__ import annotations

import re
from functools import lru_cache
from dataclasses import dataclass

from .tokens import count_tokens

MARKDOWN_TABLE_DELIMITER = re.compile(
    r"^\s*\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)+\|?\s*$"
)
MARKDOWN_HEADING = re.compile(r"^\s{0,3}#{1,6}\s*\S+")

# semantic.ts:8-27
COMMON_SENTENCE_ABBREVIATIONS = frozenset(
    [
        "bsp.", "bzw.", "ca.", "dipl.", "dr.", "etc.", "evtl.", "geb.",
        "ing.", "mr.", "mrs.", "ms.", "nr.", "prof.", "str.", "tel.",
        "usw.", "vgl.",
    ]
)

_SENTENCE_CLOSERS = frozenset(['"', "'", ")", "]", "}", "»", "“", "”"])

DEFAULT_SEMANTIC_CHUNK_SIZE = 2000  # chunking/factory.ts:40 (html → :50)
DEFAULT_SOURCE_CHUNK_TOKENS = 150  # lib/source-chunk.ts:4

_TEXT = 0
_TABLE_ROW = 1


@dataclass
class _Segment:
    text: str
    kind: int
    table_header: str = ""
    table_id: int = 0


def chunk_text(text: str, max_tokens: int) -> list[str]:
    """SemanticChunker.getChunks — returns chunk contents."""
    text = text.strip()
    if not text:
        return []
    chunks = _chunk_recursive(text, max_tokens, 0)
    chunks = _merge_tiny_chunks(chunks, max_tokens)
    return [c for c in (chunk.strip() for chunk in chunks) if c]


def chunk_text_spans(text: str, max_tokens: int) -> list[tuple[str, int, int]]:
    """SemanticChunker.getChunkSpans → [(content, start_offset, end_offset)]."""
    return resolve_spans(text, chunk_text(text, max_tokens))


def resolve_spans(text: str, chunks: list[str]) -> list[tuple[str, int, int]]:
    """chunking/span.ts:3-25, exact semantics: blank chunks skipped; the
    emitted content is always the ORIGINAL chunk; an unlocatable chunk gets
    the degenerate span (cursor, cursor) and does NOT advance the cursor."""
    out: list[tuple[str, int, int]] = []
    cursor = 0
    for chunk in chunks:
        if not chunk.strip():
            continue
        span = _locate_chunk(text, chunk, cursor)
        if span is None:
            out.append((chunk, cursor, cursor))
            continue
        out.append((chunk, span[0], span[1]))
        cursor = span[1]
    return out


def _locate_chunk(text: str, chunk: str, cursor: int) -> tuple[int, int] | None:
    """span.ts:27-50 — exact find, then trimmed find, then the
    whitespace-normalized index fallback."""
    idx = text.find(chunk, cursor)
    if idx >= 0:
        return idx, idx + len(chunk)
    trimmed = chunk.strip()
    t_idx = text.find(trimmed, cursor) if trimmed else -1
    if t_idx >= 0:
        return t_idx, t_idx + len(trimmed)
    return _fuzzy_find(text, chunk, cursor)


_NONWS_RE = re.compile(r"\S+")


@lru_cache(maxsize=2)
def _ws_norm_table(text: str):
    """Whitespace-run-collapsed view of `text` + normalized→original index
    map (each collapsed space maps to its run's start, i.e. the index just
    past the previous non-ws run). Memoized per text so resolve_spans'
    repeated fuzzy fallbacks don't rebuild an O(doc) table per chunk; the
    runs come from one regex scan instead of a per-char Python loop.

    The map is a compact array('q') (8 bytes/char; bisect works on it
    directly) and the cache holds ≤2 documents — resolve_spans processes one
    document at a time, and caching 8 multi-MB docs of per-char Python ints
    pinned hundreds of MB per executor python worker."""
    from array import array

    parts: list[str] = []
    index_map = array("q")
    prev_end: int | None = None
    for match in _NONWS_RE.finditer(text):
        a, b = match.span()
        if prev_end is not None:
            parts.append(" ")
            index_map.append(prev_end)
        parts.append(text[a:b])
        index_map.extend(range(a, b))
        prev_end = b
    return "".join(parts), index_map


def _fuzzy_find(text: str, chunk: str, cursor: int) -> tuple[int, int] | None:
    """span.ts:53-116 — whitespace runs collapse to a single space on both
    sides; matched offsets map back through the normalized-index table.
    Equivalent to scanning from `cursor`: the table is global, the search
    starts at the first normalized position at-or-after cursor, skipping a
    leading collapsed space (the per-cursor scan never emits one)."""
    from bisect import bisect_left

    needle = " ".join(chunk.split())
    if not needle:
        return None
    norm, index_map = _ws_norm_table(text)
    p0 = bisect_left(index_map, max(0, cursor))
    if p0 < len(norm) and norm[p0] == " ":
        p0 += 1
    pos = norm.find(needle, p0)
    if pos < 0:
        return None
    return index_map[pos], index_map[pos + len(needle) - 1] + 1


def _join_parts(left: str, right: str) -> str:
    left, right = left.strip(), right.strip()
    if not left:
        return right
    if not right:
        return left
    return f"{left}\n\n{right}"


def _chunk_recursive(text: str, max_tokens: int, level: int) -> list[str]:
    normalized = text.strip()
    if not normalized:
        return []
    if max_tokens <= 0:
        return _chunk_by_sentence_or_table(normalized, max_tokens)
    if count_tokens(normalized) <= max_tokens:
        return [normalized]
    if level >= 2:
        return _chunk_by_sentence_or_table(normalized, max_tokens)

    parts = _split_by_level(normalized, level)
    if len(parts) <= 1:
        return _chunk_recursive(normalized, max_tokens, level + 1)

    # greedy packing with INCREMENTAL counts: our tokenizer never produces a
    # piece spanning whitespace, so count(a + "\n\n" + b) == count(a) +
    # count(b) exactly — no need to re-count the growing candidate (the
    # reference re-encodes the candidate each step; same result, O(n²) cost)
    result: list[str] = []
    current = ""
    current_n = 0
    for raw_part in parts:
        part = raw_part.strip()
        if not part:
            continue
        if count_tokens(part) > max_tokens:
            sub_chunks = _chunk_recursive(part, max_tokens, level + 1)
        else:
            sub_chunks = [part]
        for raw_sub in sub_chunks:
            sub = raw_sub.strip()
            if not sub:
                continue
            sub_n = count_tokens(sub)
            if not current:
                current, current_n = sub, sub_n
                continue
            if current_n + sub_n <= max_tokens:
                current = _join_parts(current, sub)
                current_n += sub_n
                continue
            result.append(current)
            current, current_n = sub, sub_n
    if current:
        result.append(current)

    if not result:
        return _chunk_recursive(normalized, max_tokens, level + 1)
    return result


def _split_by_level(text: str, level: int) -> list[str]:
    if level == 0:
        return _split_double_empty(text)
    if level == 1:
        return _split_headings(text)
    return [text]


def _strip_cr(line: str) -> str:
    return line[:-1] if line.endswith("\r") else line


def _split_double_empty(text: str) -> list[str]:
    parts: list[str] = []
    current: list[str] = []
    empty_run = 0

    def flush() -> None:
        nonlocal current
        if current:
            part = "\n".join(current).strip()
            if part:
                parts.append(part)
            current = []

    for raw in text.split("\n"):
        line = _strip_cr(raw)
        if not line.strip():
            empty_run += 1
            if empty_run >= 2:
                flush()
            continue
        if empty_run == 1:
            current.append("")
        empty_run = 0
        current.append(line)
    flush()
    if not parts:
        stripped = text.strip()
        return [stripped] if stripped else []
    return parts


def _split_headings(text: str) -> list[str]:
    parts: list[str] = []
    current: list[str] = []
    has_heading = False

    def flush() -> None:
        nonlocal current
        if current:
            part = "\n".join(current).strip()
            if part:
                parts.append(part)
            current = []

    for raw in text.split("\n"):
        line = _strip_cr(raw)
        if MARKDOWN_HEADING.match(line):
            has_heading = True
            flush()
        current.append(line)
    flush()
    if not has_heading:
        stripped = text.strip()
        return [stripped] if stripped else []
    return parts


def _chunk_by_sentence_or_table(text: str, max_tokens: int) -> list[str]:
    segments = _split_into_segments(text)
    if not segments:
        return []
    if max_tokens <= 0:
        return [
            c
            for c in (
                _build_chunk_text(segments, i, i + 1).strip()
                for i in range(len(segments))
            )
            if c
        ]

    # incremental window count: chunk text joins segments with single
    # whitespace separators (plus re-emitted table headers), so the token
    # count of a window is the sum of per-segment counts + header counts —
    # maintained incrementally instead of re-counting the window each step
    seg_n = [count_tokens(seg.text) for seg in segments]
    header_n: dict[int, int] = {}
    for seg in segments:
        if seg.kind == _TABLE_ROW and seg.table_header and seg.table_id not in header_n:
            header_n[seg.table_id] = count_tokens(seg.table_header)

    chunks: list[str] = []
    start, end = -1, -1
    run_n = 0
    run_table_id = -1

    def seg_delta(index: int, table_id: int) -> tuple[int, int]:
        seg = segments[index]
        if seg.kind == _TABLE_ROW:
            extra = (
                header_n.get(seg.table_id, 0)
                if seg.table_header and seg.table_id != table_id
                else 0
            )
            return seg_n[index] + extra, seg.table_id
        return seg_n[index], -1

    def flush() -> None:
        nonlocal start, end
        if start < 0 or end <= start:
            return
        chunk = _build_chunk_text(segments, start, end).strip()
        if chunk:
            chunks.append(chunk)
        start, end = -1, -1

    for index in range(len(segments)):
        if start < 0:
            start, end = index, index + 1
            run_n, run_table_id = seg_delta(index, -1)
            continue
        delta, next_table_id = seg_delta(index, run_table_id)
        if run_n + delta <= max_tokens:
            end = index + 1
            run_n += delta
            run_table_id = next_table_id
            continue
        flush()
        start, end = index, index + 1
        run_n, run_table_id = seg_delta(index, -1)
    flush()
    return chunks


def _merge_tiny_chunks(chunks: list[str], max_tokens: int) -> list[str]:
    if len(chunks) <= 1 or max_tokens <= 0:
        return chunks
    chunks = list(chunks)
    min_tokens = max((max_tokens * 5 + 99) // 100, 1)  # ceil(max*0.05)
    index = 0
    while index < len(chunks):
        chunks[index] = chunks[index].strip()
        if not chunks[index]:
            del chunks[index]
            continue
        if count_tokens(chunks[index]) > min_tokens or len(chunks) == 1:
            index += 1
            continue
        if index == 0:
            chunks[1] = _join_parts(chunks[0], chunks[1])
            del chunks[0]
            continue
        chunks[index - 1] = _join_parts(chunks[index - 1], chunks[index])
        del chunks[index]
        index = max(index - 1, 0)
    return chunks


def _is_table_row(line: str) -> bool:
    trimmed = line.strip()
    return bool(trimmed) and "|" in trimmed


def _split_into_segments(text: str) -> list[_Segment]:
    lines = text.split("\n")
    segments: list[_Segment] = []
    current_sentence = ""

    def append_sentence() -> None:
        nonlocal current_sentence
        value = current_sentence.strip()
        if value:
            segments.append(_Segment(value, _TEXT))
        current_sentence = ""

    def feed_sentences(trimmed: str) -> None:
        nonlocal current_sentence
        for sentence in _split_line_into_sentences(trimmed):
            current_sentence = (
                sentence if not current_sentence else f"{current_sentence} {sentence}"
            )
            if _ends_with_terminator(sentence):
                append_sentence()

    in_table = False
    table_id = 0
    table_header = ""
    table_has_rows = False

    index = 0
    while index < len(lines):
        line = _strip_cr(lines[index])
        trimmed = line.strip()

        if (
            not in_table
            and _is_table_row(line)
            and index + 1 < len(lines)
            and MARKDOWN_TABLE_DELIMITER.match(lines[index + 1].strip())
        ):
            append_sentence()
            in_table = True
            table_id += 1
            table_header = f"{line}\n{_strip_cr(lines[index + 1])}"
            table_has_rows = False
            index += 2
            continue

        if in_table:
            if not trimmed or not _is_table_row(line):
                if not table_has_rows and table_header:
                    segments.append(_Segment(table_header, _TEXT))
                in_table = False
                table_header = ""
                table_has_rows = False
                if not trimmed:
                    append_sentence()
                    index += 1
                    continue
                feed_sentences(trimmed)
                index += 1
                continue
            segments.append(_Segment(line, _TABLE_ROW, table_header, table_id))
            table_has_rows = True
            index += 1
            continue

        if _is_table_row(line):
            append_sentence()
            if trimmed:
                segments.append(_Segment(trimmed, _TEXT))
            index += 1
            continue

        if not trimmed:
            append_sentence()
            index += 1
            continue

        feed_sentences(trimmed)
        index += 1

    if in_table and not table_has_rows and table_header:
        segments.append(_Segment(table_header, _TEXT))
    append_sentence()
    return [s for s in segments if s.text.strip()]


def _build_chunk_text(segments: list[_Segment], start: int, end: int) -> str:
    chunk = []
    current_table_id = -1
    last_kind = _TEXT
    has_content = False
    for index in range(start, end):
        seg = segments[index]
        if (
            seg.kind == _TABLE_ROW
            and seg.table_header
            and seg.table_id != current_table_id
        ):
            chunk.append(
                (f"\n{seg.table_header}\n{seg.text}")
                if has_content
                else f"{seg.table_header}\n{seg.text}"
            )
            has_content = True
            current_table_id = seg.table_id
            last_kind = _TABLE_ROW
            continue
        if has_content:
            if seg.kind == _TABLE_ROW or last_kind == _TABLE_ROW:
                chunk.append("\n")
            else:
                chunk.append(" ")
        chunk.append(seg.text)
        has_content = True
        if seg.kind == _TABLE_ROW:
            current_table_id = seg.table_id
            last_kind = _TABLE_ROW
        else:
            current_table_id = -1
            last_kind = _TEXT
    return "".join(chunk)


# --- sentence splitting (semantic.ts:547-749) ----------------------------


_TERMINATOR_RE = re.compile(r"[.!?]")


def _split_line_into_sentences(line: str) -> list[str]:
    if not line:
        return []
    chars = list(line)
    sentences: list[str] = []
    start = 0

    def flush(end: int) -> None:
        nonlocal start
        if end <= start:
            return
        sentence = line[start:end].strip()
        if sentence:
            sentences.append(sentence)
        start = end

    # visit only terminator characters (regex scan) instead of every char —
    # identical to the round-2 per-char walk because _is_boundary is False
    # for everything outside [.!?]
    index = 0
    n = len(chars)
    for match in _TERMINATOR_RE.finditer(line):
        i = match.start()
        if i < index:  # consumed by a previous sentence's terminator run
            continue
        if not _is_boundary(chars, i):
            continue
        end = i + 1
        while end < n and chars[end] in (".", "!", "?"):
            end += 1
        while end < n and chars[end] in _SENTENCE_CLOSERS:
            end += 1
        flush(end)
        index = end
    flush(n)
    return sentences


def _ends_with_terminator(sentence: str) -> bool:
    trimmed = sentence.strip()
    if not trimmed:
        return False
    index = len(trimmed) - 1
    while index >= 0 and trimmed[index] in _SENTENCE_CLOSERS:
        index -= 1
    if index < 0:
        return False
    return trimmed[index] in (".", "!", "?")


def _is_boundary(chars: list[str], index: int) -> bool:
    ch = chars[index]
    if ch in ("!", "?"):
        return True
    if ch != ".":
        return False
    if _is_date_or_decimal_dot(chars, index):
        return False
    if _is_numeric_listing_dot(chars, index):
        return False
    if _is_abbreviation_dot(chars, index):
        return False
    return True


def _prev_non_space(chars: list[str], start: int) -> int:
    for i in range(start, -1, -1):
        if not chars[i].isspace():
            return i
    return -1


def _next_non_space(chars: list[str], start: int) -> int:
    for i in range(start, len(chars)):
        if not chars[i].isspace():
            return i
    return -1


def _is_digit(ch: str) -> bool:
    return ch.isdigit() or (ch.isnumeric() and len(ch) == 1)


def _is_letter(ch: str) -> bool:
    return ch.isalpha()


def _is_date_or_decimal_dot(chars: list[str], dot: int) -> bool:
    prev = _prev_non_space(chars, dot - 1)
    nxt = _next_non_space(chars, dot + 1)
    if prev >= 0 and nxt >= 0 and _is_digit(chars[prev]) and _is_digit(chars[nxt]):
        return True
    if prev < 0 or not _is_digit(chars[prev]):
        return False
    number_start = prev
    while number_start >= 0 and _is_digit(chars[number_start]):
        number_start -= 1
    previous_dot = _prev_non_space(chars, number_start)
    previous_digit = _prev_non_space(chars, previous_dot - 1) if previous_dot >= 1 else -1
    return (
        previous_dot >= 0
        and chars[previous_dot] == "."
        and previous_digit >= 0
        and _is_digit(chars[previous_digit])
    )


def _is_numeric_listing_dot(chars: list[str], dot: int) -> bool:
    prev = _prev_non_space(chars, dot - 1)
    nxt = _next_non_space(chars, dot + 1)
    if prev < 0 or nxt < 0:
        return False
    if not _is_digit(chars[prev]) or not _is_letter(chars[nxt]):
        return False
    if dot + 1 < len(chars) and chars[dot + 1].isspace() and chars[nxt].isupper():
        return True
    number_start = prev
    while number_start >= 0 and _is_digit(chars[number_start]):
        number_start -= 1
    before_number = _prev_non_space(chars, number_start)
    if before_number < 0:
        return True
    return chars[before_number] in (".", ":", ";", "(", "[", "{")


def _is_abbreviation_dot(chars: list[str], dot: int) -> bool:
    prev = _prev_non_space(chars, dot - 1)
    if prev < 0 or not _is_letter(chars[prev]):
        return False
    word_start = prev
    while word_start >= 0 and (_is_letter(chars[word_start]) or chars[word_start] == "-"):
        word_start -= 1
    word = "".join(chars[word_start + 1 : prev + 1]).strip().lower()
    if not word:
        return False
    if (word + ".") in COMMON_SENTENCE_ABBREVIATIONS:
        return True
    if len(word) != 1:
        return False
    nxt = _next_non_space(chars, dot + 1)
    if nxt >= 0 and _is_letter(chars[nxt]):
        next_dot = _next_non_space(chars, nxt + 1)
        if next_dot >= 0 and chars[next_dot] == ".":
            return True
    previous_dot = _prev_non_space(chars, word_start)
    if previous_dot < 0 or chars[previous_dot] != ".":
        return False
    previous_letter = _prev_non_space(chars, previous_dot - 1)
    if previous_letter < 0 or not _is_letter(chars[previous_letter]):
        return False
    previous_word_start = previous_letter
    while previous_word_start >= 0 and _is_letter(chars[previous_word_start]):
        previous_word_start -= 1
    if previous_letter - previous_word_start != 1:
        return False
    next_after_dot = _next_non_space(chars, dot + 1)
    if (
        next_after_dot >= 0
        and chars[next_after_dot].islower()
        and chars[prev].isupper()
        and chars[previous_letter].isupper()
    ):
        return False
    return True
