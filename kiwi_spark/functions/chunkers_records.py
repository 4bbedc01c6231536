"""Record/markup-structured chunkers — full ports of the reference's
yaml/toml/email/calendar/vcard/transcript chunker family plus the shared
line-packing helpers.

Sources (semantics ported 1:1, token counter substituted — see
functions.tokens):

* chunking/structured.ts:38-139  — chunkLinesWithPrefix / chunkLongLine /
                                    chunkByCharacterWindow
* chunking/yaml.ts:1-235         — recursive block split with Path/Context
                                    prefixes
* chunking/toml.ts:1-302         — table/array-table sections, entry split,
                                    quoted-path handling
* chunking/email.ts:1-124        — "# Email Message"/"## Message N" sections,
                                    greedy packing with shared preamble
* chunking/calendar.ts:1-83      — "## Event/Todo/Journal N" records, one
                                    record per chunk
* chunking/vcard.ts:1-79         — "## Contact N" records, one per chunk
* chunking/transcript.ts:1-155   — "## Segment N" sections, greedy packing,
                                    per-segment metadata prefix on splits
"""

from __future__ import annotations

import re

from .tokens import count_tokens

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_-]*$")


# --------------------------------------------------------------------------
# shared line packing (structured.ts:38-139)
# --------------------------------------------------------------------------

def chunk_lines_with_prefix(lines: list[str], max_tokens: int,
                            prefix: str | None = None) -> list[str]:
    prefix = (prefix or "").strip() or None
    chunks: list[str] = []
    current: list[str] = []

    def fmt(ls: list[str]) -> str:
        body = "\n".join(ls).strip()
        return f"{prefix}\n{body}".strip() if prefix else body

    def flush() -> None:
        nonlocal current
        if current:
            chunks.append(fmt(current))
            current = []

    for line in lines:
        if current and count_tokens(fmt(current + [line])) > max_tokens:
            flush()
        if count_tokens(fmt([line])) > max_tokens:
            chunks.extend(_chunk_long_line(line, prefix, max_tokens))
            continue
        current.append(line)
    flush()
    return [c for c in chunks if c.strip()]


def _chunk_long_line(line: str, prefix: str | None, max_tokens: int) -> list[str]:
    words = [w for w in re.split(r"(\s+)", line) if w != ""]
    if len(words) <= 1:
        return _chunk_by_char_window(line, prefix, max_tokens)
    chunks: list[str] = []
    current = ""

    def fmt(value: str) -> str:
        return f"{prefix}\n{value}".strip() if prefix else value.strip()

    for word in words:
        if current != "" and count_tokens(fmt(current + word)) > max_tokens:
            chunks.append(fmt(current))
            current = ""
        if count_tokens(fmt(word)) > max_tokens:
            chunks.extend(_chunk_by_char_window(word, prefix, max_tokens))
            continue
        current += word
    if current.strip() != "":
        chunks.append(fmt(current))
    return chunks


def _chunk_by_char_window(value: str, prefix: str | None, max_tokens: int) -> list[str]:
    chunks: list[str] = []

    def fmt(chunk: str) -> str:
        return f"{prefix}\n{chunk}".strip() if prefix else chunk.strip()

    start = 0
    window = max(128, max_tokens * 3)
    while start < len(value):
        end = min(len(value), start + window)
        while end > start + 1 and count_tokens(fmt(value[start:end])) > max_tokens:
            window = max(1, int(window * 0.75))
            end = min(len(value), start + window)
        chunks.append(fmt(value[start:end]))
        start = end
    return chunks


# --------------------------------------------------------------------------
# YAML (yaml.ts)
# --------------------------------------------------------------------------

_YAML_KEY_RE = re.compile(r'^(?:"([^"]+)"|\'([^\']+)\'|([^:\[\]{}\s][^:#]*?))\s*:')


def chunk_yaml(text: str, max_tokens: int) -> list[str]:
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]
    lines = re.split(r"\r?\n", text)
    base = _yaml_base_indent(lines)
    return _yaml_chunk_lines(lines, "$", 0 if base is None else base, [], max_tokens)


def _yaml_chunk_lines(lines, path, indent, context_lines, max_tokens):
    formatted = _yaml_format(path, context_lines, lines)
    if count_tokens(formatted) <= max_tokens:
        return [formatted]

    blocks = _split_yaml_blocks(lines, indent, path)
    if not blocks:
        return chunk_lines_with_prefix(
            lines, max_tokens, _yaml_prefix(path, context_lines)
        )
    if len(blocks) == 1:
        return _yaml_oversized_block(blocks[0], indent, context_lines, max_tokens)

    chunks: list[str] = []
    current: list[str] = []

    def flush() -> None:
        nonlocal current
        if current:
            chunks.append(_yaml_format(path, context_lines, current))
            current = []

    for block_lines, block_path in blocks:
        block_text = _yaml_format(path, context_lines, block_lines)
        if count_tokens(block_text) > max_tokens:
            flush()
            chunks.extend(
                _yaml_oversized_block(
                    (block_lines, block_path), indent, context_lines, max_tokens
                )
            )
            continue
        next_text = _yaml_format(path, context_lines, current + block_lines)
        if current and count_tokens(next_text) > max_tokens:
            flush()
        current.extend(block_lines)
    flush()
    return chunks


def _yaml_oversized_block(block, indent, context_lines, max_tokens):
    block_lines, block_path = block
    nested_indent = _yaml_nested_indent(block_lines, indent)
    if nested_indent is not None:
        nested_start = _first_significant_at(block_lines, nested_indent)
        if nested_start > 0:
            return _yaml_chunk_lines(
                block_lines[nested_start:],
                block_path,
                nested_indent,
                list(context_lines) + block_lines[:nested_start],
                max_tokens,
            )
    return chunk_lines_with_prefix(
        block_lines, max_tokens, _yaml_prefix(block_path, context_lines)
    )


def _split_yaml_blocks(lines, indent, parent_path):
    starts = [
        i
        for i, line in enumerate(lines)
        if _yaml_significant(line) and _indentation(line) == indent
    ]
    if not starts:
        return []
    blocks = []
    for index, start in enumerate(starts):
        end = starts[index + 1] if index + 1 < len(starts) else len(lines)
        block_start = 0 if index == 0 else start
        blocks.append(
            (lines[block_start:end], _derive_yaml_path(parent_path, lines[start], index))
        )
    return blocks


def _yaml_significant(line: str) -> bool:
    t = line.strip()
    return t != "" and not t.startswith("#")


def _derive_yaml_path(parent_path: str, line: str, block_index: int) -> str:
    trimmed = line.strip()
    if trimmed.startswith("-"):
        after_dash = trimmed[1:].strip()
        item_path = _append_path(parent_path, f"[{block_index}]")
        key = _read_yaml_key(after_dash)
        return _append_path(item_path, key) if key else item_path
    return _append_path(
        parent_path, _read_yaml_key(trimmed) or f"section{block_index + 1}"
    )


def _read_yaml_key(value: str) -> str | None:
    match = _YAML_KEY_RE.match(value)
    if not match:
        return None
    key = (match.group(1) or match.group(2) or match.group(3) or "").strip()
    return key or None


def _append_path(parent_path: str, segment: str) -> str:
    if segment.startswith("["):
        return f"{parent_path}{segment}"
    if _IDENT_RE.match(segment):
        return f"$.{segment}" if parent_path == "$" else f"{parent_path}.{segment}"
    quoted = segment.replace("\\", "\\\\").replace('"', '\\"')
    return f'{parent_path}["{quoted}"]'


def _yaml_base_indent(lines) -> int | None:
    indents = [_indentation(ln) for ln in lines if _yaml_significant(ln)]
    return min(indents) if indents else None


def _yaml_nested_indent(lines, indent) -> int | None:
    nested = [
        i for i in (_indentation(ln) for ln in lines if _yaml_significant(ln))
        if i > indent
    ]
    return min(nested) if nested else None


def _first_significant_at(lines, indent) -> int:
    for i, line in enumerate(lines):
        if _yaml_significant(line) and _indentation(line) >= indent:
            return i
    return len(lines)


def _indentation(line: str) -> int:
    return len(line) - len(line.lstrip())


def _yaml_format(path, context_lines, body_lines) -> str:
    prefix = _yaml_prefix(path, context_lines)
    body = "\n".join(body_lines).strip()
    return f"{prefix}\n{body}".strip() if prefix else body


def _yaml_prefix(path, context_lines) -> str | None:
    parts = []
    if path != "$":
        parts.append(f"Path: {path}")
    context = "\n".join(context_lines).strip()
    if context:
        parts.append(f"Context:\n{context}")
    return "\n\n".join(parts) if parts else None


# --------------------------------------------------------------------------
# TOML (toml.ts)
# --------------------------------------------------------------------------

_TOML_ARRAY_HEADER_RE = re.compile(r"^\[\[\s*([^\]]+?)\s*\]\]$")
_TOML_TABLE_HEADER_RE = re.compile(r"^\[\s*([^\]]+?)\s*\]$")
_TOML_ENTRY_RE = re.compile(
    r'^(?:"(?:[^"\\]|\\.)+"|\'[^\']+\'|[A-Za-z0-9_-]+(?:\s*\.\s*[A-Za-z0-9_-]+)*)\s*='
)


def chunk_toml(text: str, max_tokens: int) -> list[str]:
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]
    lines = re.split(r"\r?\n", text)
    return _toml_chunk_sections(_split_toml_sections(lines), max_tokens)


def _toml_chunk_sections(sections, max_tokens):
    chunks: list[str] = []
    current: list[str] = []

    def flush() -> None:
        nonlocal current
        if current:
            chunks.append("\n".join(current).strip())
            current = []

    for section in sections:
        section_text = "\n".join(section["lines"]).strip()
        if count_tokens(section_text) > max_tokens:
            flush()
            chunks.extend(_toml_oversized_section(section, max_tokens))
            continue
        next_text = "\n".join(current + section["lines"]).strip()
        if current and count_tokens(next_text) > max_tokens:
            flush()
        current.extend(section["lines"])
    flush()
    return chunks


def _toml_oversized_section(section, max_tokens):
    header_index = section["headerIndex"]
    context_lines = section["lines"][: header_index + 1]
    body_lines = section["lines"][header_index + 1 :]
    entries = _split_toml_entries(body_lines)

    if len(entries) <= 1:
        return chunk_lines_with_prefix(
            body_lines if body_lines else section["lines"],
            max_tokens,
            _toml_prefix(section["path"], context_lines),
        )

    chunks: list[str] = []
    current: list[str] = []

    def flush() -> None:
        nonlocal current
        if current:
            chunks.append(_toml_format(section["path"], context_lines, current))
            current = []

    for entry in entries:
        entry_text = _toml_format(section["path"], context_lines, entry)
        if count_tokens(entry_text) > max_tokens:
            flush()
            chunks.extend(
                chunk_lines_with_prefix(
                    entry, max_tokens, _toml_prefix(section["path"], context_lines)
                )
            )
            continue
        next_text = _toml_format(section["path"], context_lines, current + entry)
        if current and count_tokens(next_text) > max_tokens:
            flush()
        current.extend(entry)
    flush()
    return chunks


def _split_toml_sections(lines):
    sections = []
    start = 0
    header_index = -1
    path = "$"

    def push(end: int) -> None:
        if end <= start:
            return
        sections.append(
            {
                "lines": lines[start:end],
                "headerIndex": header_index - start if header_index >= start else -1,
                "path": path,
            }
        )

    for index, line in enumerate(lines):
        header_path = _read_toml_header_path(line)
        if not header_path:
            continue
        push(index)
        start = index
        header_index = index
        path = header_path
    push(len(lines))
    return sections if sections else [{"lines": lines, "headerIndex": -1, "path": "$"}]


def _split_toml_entries(lines):
    entries = []
    current: list[str] = []
    for line in lines:
        if _is_toml_entry_start(line) and any(ln.strip() for ln in current):
            entries.append(current)
            current = []
        current.append(line)
    if current:
        entries.append(current)
    return entries


def _read_toml_header_path(line: str) -> str | None:
    trimmed = line.strip()
    array_match = _TOML_ARRAY_HEADER_RE.match(trimmed)
    if array_match and array_match.group(1):
        return _toml_path(array_match.group(1), True)
    table_match = _TOML_TABLE_HEADER_RE.match(trimmed)
    if table_match and table_match.group(1):
        return _toml_path(table_match.group(1), False)
    return None


def _toml_path(raw_path: str, array: bool) -> str:
    segments = [
        s for s in (_clean_toml_segment(seg) for seg in _split_toml_path(raw_path))
        if s != ""
    ]
    path = "$"
    for segment in segments:
        path = _append_path(path, segment)
    return f"{path}[]" if array else path


def _split_toml_path(raw_path: str) -> list[str]:
    segments: list[str] = []
    current = ""
    quote: str | None = None
    escaped = False
    for char in raw_path:
        if quote:
            current += char
            if quote == '"' and char == "\\" and not escaped:
                escaped = True
                continue
            if char == quote and not escaped:
                quote = None
            escaped = False
            continue
        if char in ('"', "'"):
            quote = char
            current += char
            continue
        if char == ".":
            segments.append(current)
            current = ""
            continue
        current += char
    segments.append(current)
    return segments


def _clean_toml_segment(segment: str) -> str:
    trimmed = segment.strip()
    if (trimmed.startswith('"') and trimmed.endswith('"')) or (
        trimmed.startswith("'") and trimmed.endswith("'")
    ):
        return trimmed[1:-1]
    return trimmed


def _is_toml_entry_start(line: str) -> bool:
    trimmed = line.strip()
    if trimmed == "" or trimmed.startswith("#") or trimmed.startswith("["):
        return False
    return bool(_TOML_ENTRY_RE.match(trimmed))


def _toml_format(path, context_lines, body_lines) -> str:
    prefix = _toml_prefix(path, context_lines)
    body = "\n".join(body_lines).strip()
    return f"{prefix}\n{body}".strip() if prefix else body


def _toml_prefix(path, context_lines) -> str | None:
    parts = []
    if path != "$":
        parts.append(f"Path: {path}")
    context = "\n".join(context_lines).strip()
    if context:
        parts.append(context)
    return "\n".join(parts) if parts else None


# --------------------------------------------------------------------------
# record-heading chunkers (email.ts / calendar.ts / vcard.ts / transcript.ts)
# --------------------------------------------------------------------------

_EMAIL_HEADING = re.compile(r"^(?:# Email Message|## Message \d+\b)")
_CALENDAR_HEADING = re.compile(r"^## (?:Event|Todo|Journal) \d+\b")
_VCARD_HEADING = re.compile(r"^## Contact \d+\b")
_TRANSCRIPT_HEADING = re.compile(r"^## Segment \d+\b")


def _split_heading_sections(text: str, heading: re.Pattern):
    lines = text.split("\n")
    first = next(
        (i for i, ln in enumerate(lines) if heading.match(ln.strip())), None
    )
    if first is None:
        return "", []
    preamble = "\n".join(lines[:first]).strip()
    sections: list[str] = []
    current: list[str] = []
    for line in lines[first:]:
        if heading.match(line.strip()) and current:
            sections.append("\n".join(current).strip())
            current = []
        current.append(line)
    if current:
        sections.append("\n".join(current).strip())
    return preamble, sections


def _format_section_chunk(preamble: str, sections: list[str]) -> str:
    parts = [p.strip() for p in [preamble, *sections] if p.strip()]
    return "\n\n".join(parts).strip()


def _chunk_packed_sections(text: str, heading: re.Pattern, max_tokens: int,
                           oversized) -> list[str]:
    """Shared email/transcript shape: greedy-pack heading sections under the
    preamble; oversized sections delegate to ``oversized(preamble, section)``."""
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]
    preamble, sections = _split_heading_sections(text, heading)
    if not sections:
        return chunk_lines_with_prefix(text.split("\n"), max_tokens)

    chunks: list[str] = []
    current: list[str] = []

    def flush() -> None:
        nonlocal current
        if current:
            chunks.append(_format_section_chunk(preamble, current))
            current = []

    for section in sections:
        if count_tokens(_format_section_chunk(preamble, [section])) > max_tokens:
            flush()
            chunks.extend(oversized(preamble, section))
            continue
        if current and count_tokens(
            _format_section_chunk(preamble, current + [section])
        ) > max_tokens:
            flush()
        current.append(section)
    flush()
    return [c for c in chunks if c.strip()]


def chunk_email(text: str, max_tokens: int) -> list[str]:
    def oversized(preamble: str, section: str) -> list[str]:
        return chunk_lines_with_prefix(section.split("\n"), max_tokens, preamble)

    return _chunk_packed_sections(text, _EMAIL_HEADING, max_tokens, oversized)


def chunk_transcript(text: str, max_tokens: int) -> list[str]:
    def oversized(preamble: str, section: str) -> list[str]:
        # split after the segment's metadata block (first blank line):
        # the heading + metadata repeat as the prefix of every piece
        lines = section.split("\n")
        body_start = next(
            (i for i, ln in enumerate(lines) if i > 0 and ln.strip() == ""), None
        )
        if body_start is None:
            return chunk_lines_with_prefix(lines, max_tokens, preamble)
        section_prefix = _format_section_chunk(
            preamble, ["\n".join(lines[:body_start]).strip()]
        )
        return chunk_lines_with_prefix(
            lines[body_start + 1 :], max_tokens, section_prefix
        )

    return _chunk_packed_sections(text, _TRANSCRIPT_HEADING, max_tokens, oversized)


def chunk_calendar(text: str, max_tokens: int) -> list[str]:
    """One record per chunk (calendar.ts chunkRecordSections — flatMap, no
    multi-record packing)."""
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]
    preamble, records = _split_heading_sections(text, _CALENDAR_HEADING)
    if not records:
        return chunk_lines_with_prefix(text.split("\n"), max_tokens)
    out: list[str] = []
    for record in records:
        if count_tokens(record) <= max_tokens:
            out.append(_format_section_chunk(preamble, [record]))
        else:
            out.extend(
                chunk_lines_with_prefix(record.split("\n"), max_tokens, preamble)
            )
    return out


def chunk_vcard(text: str, max_tokens: int) -> list[str]:
    """One contact per chunk (vcard.ts chunkContacts)."""
    text = text.strip()
    if not text:
        return []
    if count_tokens(text) <= max_tokens:
        return [text]
    preamble, contacts = _split_heading_sections(text, _VCARD_HEADING)
    if not contacts:
        return chunk_lines_with_prefix(text.split("\n"), max_tokens)
    out: list[str] = []
    for contact in contacts:
        chunk = _format_section_chunk(preamble, [contact])
        if count_tokens(chunk) <= max_tokens:
            out.append(chunk)
        else:
            out.extend(
                chunk_lines_with_prefix(contact.split("\n"), max_tokens, preamble)
            )
    return out
