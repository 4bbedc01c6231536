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
* yaml/toml/email/calendar/vcard/transcript — fall back to the semantic
            chunker at the structured chunk size (faithful enough for
            line-oriented formats; full ports are future work and the web
            corpus never selects them)
"""

from __future__ import annotations

import json as _json

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
    "yaml": ("semantic", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "toml": ("semantic", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "email": ("semantic", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "calendar": ("semantic", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "vcard": ("semantic", DEFAULT_STRUCTURED_CHUNK_SIZE),
    "transcript": ("semantic", DEFAULT_STRUCTURED_CHUNK_SIZE),
}


def chunk_single(text: str) -> list[str]:
    stripped = text.strip()
    return [stripped] if stripped else []


def chunk_csv(text: str, max_tokens: int) -> list[str]:
    """Greedy row packing; a detected header row is re-emitted at the top of
    every chunk (csv.ts renderCSVChunk)."""
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    if not lines:
        return []
    if len(lines) == 1:
        return [lines[0]]
    header = lines[0] if _is_csv_header(lines) else None
    data = lines[1:] if header else lines
    header_n = count_tokens(header) if header else 0
    chunks: list[str] = []
    current: list[str] = []
    current_n = header_n
    for row in data:
        row_n = count_tokens(row)
        if current and current_n + row_n > max_tokens:
            chunks.append("\n".join(([header] if header else []) + current))
            current, current_n = [], header_n
        current.append(row)
        current_n += row_n
    if current:
        chunks.append("\n".join(([header] if header else []) + current))
    return chunks


def _is_csv_header(lines: list[str]) -> bool:
    """Heuristic per csv.ts isCSVHeader: first row is a header when none of
    its fields parse as numbers but some field in the next row does."""
    first = lines[0].split(",")
    second = lines[1].split(",") if len(lines) > 1 else []

    def is_num(v: str) -> bool:
        try:
            float(v.strip())
            return True
        except ValueError:
            return False

    return not any(is_num(f) for f in first) and any(is_num(f) for f in second)


def chunk_json(text: str, max_tokens: int) -> list[str]:
    """Whole document if it fits; else split JSON-lines or top-level array
    elements and greedily pack (json.ts)."""
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]
    records: list[str] = []
    # JSON-lines?
    lines = text.splitlines()
    if len(lines) > 1:
        parsed = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                _json.loads(line)
                parsed.append(line)
            except ValueError:
                parsed = []
                break
        records = parsed
    if not records:
        try:
            value = _json.loads(text)
        except ValueError:
            return chunk_text(text, max_tokens)
        if isinstance(value, list):
            records = [_json.dumps(v, ensure_ascii=False) for v in value]
        elif isinstance(value, dict):
            records = [
                _json.dumps({k: v}, ensure_ascii=False) for k, v in value.items()
            ]
        else:
            return [text]
    chunks: list[str] = []
    current: list[str] = []
    current_n = 0
    for rec in records:
        rec_n = count_tokens(rec)
        if current and current_n + rec_n > max_tokens:
            chunks.append("\n".join(current))
            current, current_n = [], 0
        current.append(rec)
        current_n += rec_n
    if current:
        chunks.append("\n".join(current))
    return chunks


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
    return chunk_text(text, size)
