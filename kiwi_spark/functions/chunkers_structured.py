"""Structured-format chunkers + factory (SURVEY §2.2 C6, C7, C11 subset).

The web corpus is all-HTML (semantic chunker @ 2000 tokens), but the
reference ships per-format chunkers selected by a factory
(chunking/factory.ts:42-96, DEFAULT_SEMANTIC_CHUNK_SIZE=2000 :40, structured
default 500). Ported here with the same selection table and the core
semantics of the two most used structured chunkers:

* single  — whole text is one chunk (chunking/single.ts:3-17; used for images)
* csv     — header detection + header re-emitted per chunk + greedy row
            packing (chunking/csv.ts)
* json    — whole doc if it fits, else JSON-lines / top-level array elements
            greedily packed (chunking/json.ts)
* yaml/toml/email/calendar/vcard/transcript — full ports in
            functions.chunkers_records (yaml.ts, toml.ts, email.ts,
            calendar.ts, vcard.ts, transcript.ts)
"""

from __future__ import annotations

import json as _json

from .chunkers_records import (
    chunk_calendar,
    chunk_email,
    chunk_toml,
    chunk_transcript,
    chunk_vcard,
    chunk_yaml,
)
from .chunking import chunk_text
from .tokens import count_tokens

DEFAULT_SEMANTIC_CHUNK_SIZE = 2000  # factory.ts:40
DEFAULT_STRUCTURED_CHUNK_SIZE = 500  # factory.ts (structured default)

# chunking/factory.ts:42-62 — file type → (chunker kind, chunk size)
CHUNKER_TABLE = {
    "html": ("semantic", DEFAULT_SEMANTIC_CHUNK_SIZE),
    "markdown": ("semantic", DEFAULT_SEMANTIC_CHUNK_SIZE),
    "text": ("semantic", DEFAULT_SEMANTIC_CHUNK_SIZE),
    "pdf": ("semantic", DEFAULT_SEMANTIC_CHUNK_SIZE),
    "image": ("single", 0),
    "csv": ("csv", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "json": ("json", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "yaml": ("yaml", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "toml": ("toml", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "email": ("email", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "mbox": ("email", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "calendar": ("calendar", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "vcard": ("vcard", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "transcript": ("transcript", DEFAULT_STRUCTURED_CHUNK_SIZE),
}

_RECORD_CHUNKERS = {
    "yaml": chunk_yaml,
    "toml": chunk_toml,
    "email": chunk_email,
    "calendar": chunk_calendar,
    "vcard": chunk_vcard,
    "transcript": chunk_transcript,
}


def chunk_single(text: str) -> list[str]:
    """single.ts:3-17 — the input verbatim as one chunk (even when empty)."""
    return [text]


def chunk_single_spans(text: str) -> list[tuple[str, int, int]]:
    return [(text, 0, len(text))]


class CSVParseError(ValueError):
    def __init__(self, message: str = "Invalid CSV content") -> None:
        super().__init__(message)


def parse_csv_rows(text: str) -> list[tuple[str, list[str]]]:
    """RFC-4180-ish row parser (lib/csv.ts parseCSVRows): quoted fields may
    span newlines, "" escapes a quote, stray quotes raise CSVParseError.
    Returns (raw_row_text, fields) pairs."""
    rows: list[tuple[str, list[str]]] = []
    row_start = 0
    fields: list[str] = []
    field = ""
    in_quotes = False
    quoted_closed = False
    index = 0
    n = len(text)

    def push_field() -> None:
        nonlocal field, quoted_closed
        fields.append(field)
        field = ""
        quoted_closed = False

    def push_row(end: int) -> None:
        nonlocal fields
        push_field()
        rows.append((text[row_start:end], fields))
        fields = []

    while index < n:
        char = text[index]
        if in_quotes:
            if char == '"':
                if index + 1 < n and text[index + 1] == '"':
                    field += '"'
                    index += 2
                    continue
                in_quotes = False
                quoted_closed = True
                index += 1
                continue
            field += char
            index += 1
            continue
        if quoted_closed and char not in (",", "\n", "\r"):
            if char.strip() == "":
                index += 1
                continue
            raise CSVParseError()
        if char == '"':
            if quoted_closed or field.strip():
                raise CSVParseError()
            in_quotes = True
            field = ""
            index += 1
            continue
        if char == ",":
            push_field()
            index += 1
            continue
        if char in ("\n", "\r"):
            brk = 2 if char == "\r" and index + 1 < n and text[index + 1] == "\n" else 1
            push_row(index)
            index += brk
            row_start = index
            continue
        field += char
        index += 1

    if in_quotes:
        raise CSVParseError()
    if row_start < n or field or fields:
        push_row(n)
    return [
        (raw, flds)
        for raw, flds in rows
        if raw.strip() != "" or any(v.strip() != "" for v in flds)
    ]


def _is_numeric(value: str) -> bool:
    if value == "":
        return False
    try:
        return _math_isfinite(float(value))
    except ValueError:
        return False


def _math_isfinite(x: float) -> bool:
    return x == x and x not in (float("inf"), float("-inf"))


def _is_csv_header(rows: list[tuple[str, list[str]]]) -> bool:
    """Full multi-heuristic of csv.ts isCSVHeader: zero-numeric first row,
    numeric-ratio gap, all-numeric columns, and header-value-absence."""
    if len(rows) < 2:
        return False
    first_fields = [f.strip() for f in rows[0][1]]
    column_count = len(first_fields)
    if column_count == 0:
        return False
    sample = min(5, len(rows) - 1)
    first_numeric = sum(1 for f in first_fields if _is_numeric(f))

    column_numeric = [0] * column_count
    data_numeric_total = 0
    data_field_total = 0
    for row_index in range(1, sample + 1):
        fields = [f.strip() for f in rows[row_index][1]]
        for col in range(min(column_count, len(fields))):
            data_field_total += 1
            if _is_numeric(fields[col]):
                column_numeric[col] += 1
                data_numeric_total += 1

    if first_numeric == 0 and data_numeric_total > 0:
        return True
    first_ratio = first_numeric / column_count
    data_ratio = data_numeric_total / data_field_total if data_field_total else 0.0
    if first_ratio < 0.3 and data_ratio > first_ratio + 0.2:
        return True
    for col in range(column_count):
        if column_numeric[col] == sample and not _is_numeric(first_fields[col]):
            return True
    if first_numeric == 0 and column_count > 1:
        matches = 0
        non_empty = 0
        for col, header_value in enumerate(first_fields):
            if header_value == "":
                continue
            non_empty += 1
            for row_index in range(1, sample + 1):
                fields = [f.strip() for f in rows[row_index][1]]
                if col < len(fields) and fields[col].casefold() == header_value.casefold():
                    matches += 1
                    break
        if non_empty > 0 and matches == 0:
            return True
    return False


def chunk_csv(text: str, max_tokens: int) -> list[str]:
    """Quoted-row-aware greedy packing; a detected header row is re-emitted
    at the top of every chunk (csv.ts CSVChunker + renderCSVChunk)."""
    text = text.strip()
    if not text:
        return []
    rows = parse_csv_rows(text)
    if not rows:
        return []
    if len(rows) == 1:
        return [rows[0][0]]
    has_header = _is_csv_header(rows)
    header_raw = rows[0][0] if has_header else None
    data = rows[1:] if has_header else rows

    def render(current: list[str]) -> str:
        return "\n".join(([header_raw] if header_raw else []) + current)

    chunks: list[str] = []
    current: list[str] = []
    for raw, _fields in data:
        candidate = render(current + [raw])
        if max_tokens > 0 and current and count_tokens(candidate) > max_tokens:
            chunks.append(render(current))
            current = []
        current.append(raw)
    if current:
        chunks.append(render(current))
    return chunks


# --------------------------------------------------------------------------
# JSON (json.ts: JSON-lines / recursive object-array splitting with
# Path prefixes, JSONC comment/trailing-comma normalization)
# --------------------------------------------------------------------------

def _pretty(value) -> str:
    return _json.dumps(value, indent=2, ensure_ascii=False)


def _strip_json_comments(text: str) -> str:
    out: list[str] = []
    in_string = False
    escaped = False
    i = 0
    n = len(text)
    while i < n:
        char = text[i]
        if in_string:
            out.append(char)
            i += 1
            if escaped:
                escaped = False
            elif char == "\\":
                escaped = True
            elif char == '"':
                in_string = False
            continue
        if char == '"':
            in_string = True
            out.append(char)
            i += 1
            continue
        nxt = text[i + 1] if i + 1 < n else ""
        if char == "/" and nxt == "/":
            i += 2
            while i < n and text[i] not in ("\n", "\r"):
                i += 1
            if i < n:
                brk = text[i]
                out.append(brk)
                i += 1
                if brk == "\r" and i < n and text[i] == "\n":
                    out.append("\n")
                    i += 1
            continue
        if char == "/" and nxt == "*":
            i += 2
            out.append(" ")
            while i < n:
                if text[i] == "*" and i + 1 < n and text[i + 1] == "/":
                    i += 2
                    break
                if text[i] == "\n":
                    out.append("\n")
                i += 1
            continue
        out.append(char)
        i += 1
    return "".join(out)


def _remove_trailing_commas(text: str) -> str:
    out: list[str] = []
    in_string = False
    escaped = False
    i = 0
    n = len(text)
    while i < n:
        char = text[i]
        if in_string:
            out.append(char)
            i += 1
            if escaped:
                escaped = False
            elif char == "\\":
                escaped = True
            elif char == '"':
                in_string = False
            continue
        if char == '"':
            in_string = True
            out.append(char)
            i += 1
            continue
        if char == ",":
            j = i + 1
            while j < n and text[j].isspace():
                j += 1
            if j < n and text[j] in ("}", "]"):
                i += 1
                continue
        out.append(char)
        i += 1
    return "".join(out)


def _parse_json_document(text: str):
    try:
        return _json.loads(text)
    except ValueError:
        normalized = _remove_trailing_commas(_strip_json_comments(text))
        if normalized == text:
            return None
        try:
            return _json.loads(normalized)
        except ValueError:
            return None


def _parse_json_lines(text: str):
    records = []
    for raw in text.splitlines():
        content = raw.strip()
        if not content:
            continue
        try:
            records.append((content, _json.loads(content)))
        except ValueError:
            return None
    return records if len(records) > 1 else None


def _chunk_json_value(value, path: str, max_tokens: int) -> list[str]:
    if isinstance(value, dict):
        return _chunk_json_object(value, path, max_tokens, top_level=False)
    if isinstance(value, list):
        return _chunk_json_array(value, path, max_tokens)
    return [f"Path: {path}\n{_pretty(value)}"]


def _chunk_json_object(obj: dict, path: str, max_tokens: int,
                       top_level: bool) -> list[str]:
    # top level: document key order (Python dicts preserve it); nested
    # recursion: sorted keys (json.ts objectKeysInOrder with no preference)
    keys = list(obj.keys()) if top_level else sorted(obj.keys())
    chunks: list[str] = []
    current: dict = {}
    current_n = 0

    def flush() -> None:
        nonlocal current, current_n
        if not current:
            return
        text = _pretty(current)
        if path != "$":
            text = f"Path: {path}\n{text}"
        chunks.append(text)
        current = {}
        current_n = 0

    for key in keys:
        value = obj[key]
        entry_text = _pretty({key: value})
        entry_n = count_tokens(entry_text)
        if entry_n > max_tokens:
            flush()
            chunks.extend(_chunk_json_value(value, f"{path}.{key}", max_tokens))
            continue
        if current and current_n + entry_n > max_tokens:
            flush()
        current[key] = value
        current_n += entry_n
    flush()
    return chunks


def _chunk_json_array(values: list, path: str, max_tokens: int) -> list[str]:
    chunks: list[str] = []
    current: list = []
    current_n = 0

    def flush() -> None:
        nonlocal current, current_n
        if not current:
            return
        text = _pretty(current)
        if path != "$":
            text = f"Path: {path}\n{text}"
        chunks.append(text)
        current = []
        current_n = 0

    for index, value in enumerate(values):
        entry_text = _pretty(value)
        entry_n = count_tokens(entry_text)
        if entry_n > max_tokens:
            flush()
            chunks.extend(_chunk_json_value(value, f"{path}[{index}]", max_tokens))
            continue
        if current and current_n + entry_n > max_tokens:
            flush()
        current.append(value)
        current_n += entry_n
    flush()
    return chunks


def chunk_json(text: str, max_tokens: int) -> list[str]:
    """Whole document if it fits; else JSON-lines packing or recursive
    object/array splitting with ``Path: $…`` prefixes; JSONC comments and
    trailing commas normalized; invalid JSON stays one chunk (json.ts)."""
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]

    json_lines = _parse_json_lines(text)
    if json_lines:
        chunks: list[str] = []
        current: list[str] = []
        current_n = 0
        for index, (content, value) in enumerate(json_lines):
            rec_n = count_tokens(content)
            if rec_n > max_tokens:
                if current:
                    chunks.append("\n".join(current))
                    current, current_n = [], 0
                chunks.extend(_chunk_json_value(value, f"$[{index}]", max_tokens))
                continue
            if current and current_n + rec_n > max_tokens:
                chunks.append("\n".join(current))
                current, current_n = [], 0
            current.append(content)
            current_n += rec_n
        if current:
            chunks.append("\n".join(current))
        return chunks

    value = _parse_json_document(text)
    if value is None:
        return [text]
    if isinstance(value, dict):
        return _chunk_json_object(value, "$", max_tokens, top_level=True)
    if isinstance(value, list):
        return _chunk_json_array(value, "$", max_tokens)
    return [text]


def chunk_for_type(file_type: str, text: str, chunk_size: int | None = None) -> list[str]:
    """Factory entry point (createGraphChunker, factory.ts:64-92)."""
    kind, default_size = CHUNKER_TABLE.get(
        file_type, ("semantic", DEFAULT_SEMANTIC_CHUNK_SIZE)
    )
    size = chunk_size or default_size
    if kind == "single":
        return chunk_single(text)
    if kind == "csv":
        return chunk_csv(text, size)
    if kind == "json":
        return chunk_json(text, size)
    if kind in _RECORD_CHUNKERS:
        return _RECORD_CHUNKERS[kind](text, size)
    return chunk_text(text, size)
