"""Scoped PDF text extraction: bytes → per-page fenced text.

Port of the text half of the reference's PDF loader (loader/pdf/document.ts
+ content.ts + text.ts — output shape ``:::PAGE-n:::\\n\\n<text>`` joined
with blank lines, like ocr.ts:41-44). Pure Python:

* object scan (``N 0 obj … endobj``) instead of xref tables — robust to
  appended/linearized files
* page order via the /Root → /Pages → /Kids tree, falling back to document
  order
* content streams: FlateDecode via stdlib zlib; uncompressed passthrough;
  other filters skipped
* text operators: BT/ET blocks, Tj / ' / " and TJ arrays, line advances on
  Td/TD/T*/Tm; literal-string escapes (octal, \\n…) and <hex> strings

NOT ported (needs font machinery / OCR): CID/Type0 composite fonts with
ToUnicode CMaps (bytes are decoded as Latin-1 — correct for the common
simple-font case), layout-aware column/table reconstruction, image OCR.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj number → (dict/body bytes, raw stream bytes or None)."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for match in _OBJ_RE.finditer(data):
        num = int(match.group(1))
        body = match.group(2)
        stream = None
        smatch = _STREAM_RE.search(body)
        if smatch:
            stream = smatch.group(1)
            body = body[: smatch.start()]
        objects[num] = (body, stream)
    return objects


def _decode_stream(body: bytes, stream: bytes) -> bytes | None:
    if b"/FlateDecode" in body:
        try:
            return zlib.decompress(stream)
        except zlib.error:
            try:  # some writers pad the stream; try trimming trailing EOL
                return zlib.decompress(stream.rstrip(b"\r\n"))
            except zlib.error:
                return None
    if b"/Filter" in body:
        return None  # unsupported filter (DCT, LZW, …)
    return stream


def _page_order(objects: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """Page object numbers in tree order; document order as fallback."""
    pages_in_doc_order = [
        num
        for num, (body, _s) in objects.items()
        if re.search(rb"/Type\s*/Page\b(?!s)", body)
    ]

    def kids_walk(num: int, seen: set[int]) -> list[int]:
        if num in seen or num not in objects:
            return []
        seen.add(num)
        body = objects[num][0]
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            return [num]
        kids_match = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
        if not kids_match:
            return []
        out: list[int] = []
        for ref in _REF_RE.finditer(kids_match.group(1)):
            out += kids_walk(int(ref.group(1)), seen)
        return out

    for num, (body, _s) in objects.items():
        if b"/Type" in body and re.search(rb"/Type\s*/Catalog\b", body):
            root_match = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", body)
            if root_match:
                ordered = kids_walk(int(root_match.group(1)), set())
                if ordered:
                    return ordered
    return pages_in_doc_order


def _content_bytes(page_body: bytes,
                   objects: dict[int, tuple[bytes, bytes | None]]) -> bytes:
    contents_match = re.search(
        rb"/Contents\s*(\[(?:[^\]]*)\]|\d+\s+\d+\s+R)", page_body, re.S
    )
    if not contents_match:
        return b""
    refs = [int(m.group(1)) for m in _REF_RE.finditer(contents_match.group(1))]
    chunks: list[bytes] = []
    for ref in refs:
        entry = objects.get(ref)
        if not entry or entry[1] is None:
            continue
        decoded = _decode_stream(entry[0], entry[1])
        if decoded:
            chunks.append(decoded)
    return b"\n".join(chunks)


def _decode_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        ch = raw[i : i + 1]
        if ch == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():
                octal = raw[i + 1 : i + 4]
                octal = re.match(rb"[0-7]{1,3}", octal).group(0)
                out.append(int(octal, 8) & 0xFF)
                i += 1 + len(octal)
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and raw[i : i + 1] == b"\n":
                    i += 1
                continue
            out += nxt
            i += 2
            continue
        out += ch
        i += 1
    return out.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^)]*\))*\)"  # literal string (1-level nesting)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|/[^\s/\[\]()<>{}]*"  # name
    rb"|[-+.\d][-+.\d]*"  # number
    rb"|[A-Za-z'\"*]+"  # operator
)


def extract_content_text(content: bytes) -> str:
    """Walk a content stream's text operators into plain text lines."""
    lines: list[str] = []
    current: list[str] = []
    stack: list[bytes] = []  # recent operands

    def flush_line() -> None:
        nonlocal current
        text = "".join(current)
        if text.strip():
            lines.append(text)
        current = []

    def decode_operand(operand: bytes) -> str | None:
        if operand[:1] == b"(":
            return _decode_pdf_string(operand[1:-1])
        if operand[:1] == b"<":
            hexstr = re.sub(rb"\s", b"", operand[1:-1])
            if len(hexstr) % 2:
                hexstr += b"0"
            return bytes.fromhex(hexstr.decode()).decode("latin-1")
        return None

    for match in _TOKEN_RE.finditer(content):
        token = match.group(0)
        first = token[:1]
        is_operand = (
            first in (b"(", b"<", b"/", b"[", b"]", b"-", b"+", b".")
            or first.isdigit()
        )
        if is_operand:
            stack.append(token)
            continue
        op = token
        if op in (b"Tj", b"'", b'"'):
            if op in (b"'", b'"'):
                flush_line()  # ' and " move to the next line first
            for operand in reversed(stack):
                text = decode_operand(operand)
                if text is not None:
                    current.append(text)
                    break
        elif op == b"TJ":
            start = 0
            for index in range(len(stack) - 1, -1, -1):
                if stack[index] == b"[":
                    start = index + 1
                    break
            for operand in stack[start:]:
                text = decode_operand(operand)
                if text is not None:
                    current.append(text)
        elif op in (b"Td", b"TD", b"T*", b"Tm", b"ET"):
            flush_line()
        stack = []
    flush_line()
    return "\n".join(lines)


def pdf_to_text(data: bytes) -> str:
    """PDF bytes → ``:::PAGE-n:::``-fenced page texts (empty pages skipped);
    '' when nothing decodable."""
    if not data.startswith(b"%PDF-"):
        return ""
    objects = _parse_objects(data)
    if not objects:
        return ""
    parts: list[str] = []
    for index, num in enumerate(_page_order(objects)):
        content = _content_bytes(objects[num][0], objects)
        if not content:
            continue
        text = extract_content_text(content).strip()
        if text:
            parts.append(f":::PAGE-{index + 1}:::\n\n{text}")
    return "\n\n".join(parts)
