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

* composite fonts: per-page /Resources → /Font table; fonts carrying a
  /ToUnicode CMap stream (begincmap … bfchar/bfrange, codespacerange code
  width) decode their strings code-by-code to UTF-16BE targets — the
  text half of the reference's loader/pdf/unicode.ts + text.ts. The
  current font is tracked through ``Tf``; simple fonts without a CMap
  keep the Latin-1 fast path.

Column/band reading-order layout (loader/pdf/layout.ts) is ported in
this file (see the layout pass over positioned runs). Drawn-grid table
reconstruction (loader/pdf/table.ts "lines" strategy) is ported in the
companion module ``pdf_tables`` and wired into the layout pass: detected
tables render as markdown pipe tables in reading-order position. NOT
ported (needs rasterizing/OCR): image OCR and page rasterization
(loader/pdf/ocr.ts, rasterize.ts), and table.ts's text-alignment
strategy + rotated-table transposition (need per-glyph metrics).
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


def _extract_value(body: bytes, key: bytes):
    """Value after /key: an int object ref, or the balanced ``<< … >>``
    inline-dict bytes, or None."""
    match = re.search(rb"/" + key + rb"\s*", body)
    if not match:
        return None
    rest = body[match.end():]
    ref = re.match(rb"(\d+)\s+\d+\s+R", rest)
    if ref:
        return int(ref.group(1))
    if rest.startswith(b"<<"):
        depth = 0
        i = 0
        while i < len(rest) - 1:
            pair = rest[i : i + 2]
            if pair == b"<<":
                depth += 1
                i += 2
            elif pair == b">>":
                depth -= 1
                i += 2
                if depth == 0:
                    return rest[:i]
            else:
                i += 1
    return None


def _utf16be_hex(hexbytes: bytes) -> str:
    try:
        return bytes.fromhex(hexbytes.decode()).decode("utf-16-be", "ignore")
    except ValueError:
        return ""


def _parse_cmap(data: bytes):
    """ToUnicode CMap stream → (code → unicode str, code byte width) or
    None. Handles bfchar pairs, bfrange scalar (incrementing the last
    UTF-16 code unit) and array forms, and codespacerange width
    (loader/pdf/unicode.ts semantics)."""
    mapping: dict[int, str] = {}
    code_bytes = 2
    cs = re.search(rb"begincodespacerange(.*?)endcodespacerange", data, re.S)
    if cs:
        first = re.search(rb"<([0-9A-Fa-f]+)>", cs.group(1))
        if first:
            code_bytes = max(1, len(first.group(1)) // 2)
    for section in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for pair in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", section.group(1)
        ):
            mapping[int(pair.group(1), 16)] = _utf16be_hex(pair.group(2))
    _ARRAY_FORM = rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]"
    for section in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = section.group(1)
        for rng in re.finditer(_ARRAY_FORM, body, re.S):
            lo, hi = int(rng.group(1), 16), int(rng.group(2), 16)
            targets = re.findall(rb"<([0-9A-Fa-f]+)>", rng.group(3))
            for off, dst in enumerate(targets):
                if lo + off <= hi:
                    mapping[lo + off] = _utf16be_hex(dst)
        # array entries removed first so their elements can't be mistaken
        # for a scalar <lo> <hi> <dst> triple
        scalar_body = re.sub(_ARRAY_FORM, b"", body, flags=re.S)
        for rng in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
            scalar_body,
        ):
            lo, hi = int(rng.group(1), 16), int(rng.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:  # malformed range guard
                continue
            dst = rng.group(3)
            if len(dst) % 4:
                dst = dst.rjust((len(dst) + 3) // 4 * 4, b"0")
            units = [int(dst[i : i + 4], 16) for i in range(0, len(dst), 4)]
            if not units:
                continue
            for off in range(hi - lo + 1):
                incremented = units[:-1] + [units[-1] + off]
                raw = b"".join(u.to_bytes(2, "big") for u in incremented)
                mapping[lo + off] = raw.decode("utf-16-be", "ignore")
    return (mapping, code_bytes) if mapping else None


def _page_fonts(page_body: bytes,
                objects: dict[int, tuple[bytes, bytes | None]]) -> dict:
    """Font name → (cmap dict, code width) for fonts with a /ToUnicode
    stream. /Resources resolves on the page or is inherited via /Parent."""
    body = page_body
    resources = _extract_value(body, b"Resources")
    seen: set[int] = set()
    while resources is None:
        parent = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", body)
        if not parent:
            break
        pnum = int(parent.group(1))
        if pnum in seen or pnum not in objects:
            break
        seen.add(pnum)
        body = objects[pnum][0]
        resources = _extract_value(body, b"Resources")
    if resources is None:
        return {}
    if isinstance(resources, int):
        resources = objects.get(resources, (b"", None))[0]
    font_dict = _extract_value(resources, b"Font")
    if isinstance(font_dict, int):
        font_dict = objects.get(font_dict, (b"", None))[0]
    if not font_dict:
        return {}
    fonts: dict = {}
    for fm in re.finditer(rb"/([^\s/\[\]()<>{}]+)\s+(\d+)\s+\d+\s+R", font_dict):
        entry = objects.get(int(fm.group(2)))
        if not entry:
            continue
        tou = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", entry[0])
        if not tou:
            continue
        tobj = objects.get(int(tou.group(1)))
        if not tobj or tobj[1] is None:
            continue
        data = _decode_stream(tobj[0], tobj[1])
        if data is None:
            continue
        cmap = _parse_cmap(data)
        if cmap:
            fonts[fm.group(1).decode("latin-1")] = cmap
    return fonts


def _apply_cmap(raw: bytes, mapping: dict[int, str], code_bytes: int) -> str:
    # codes absent from the ToUnicode mapping become U+FFFD, matching the
    # reference's UNICODE_REPLACEMENT_CHARACTER fallback (loader/pdf/
    # unicode.ts) — dropping them would silently lose text on
    # partially-mapped composite fonts
    out: list[str] = []
    for i in range(0, len(raw), code_bytes):
        code = int.from_bytes(raw[i : i + code_bytes], "big")
        out.append(mapping.get(code, "�"))
    return "".join(out)


def _pdf_string_bytes(raw: bytes) -> bytes:
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
    return bytes(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^)]*\))*\)"  # literal string (1-level nesting)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|/[^\s/\[\]()<>{}]*"  # name
    rb"|[-+.\d][-+.\d]*"  # number
    rb"|[A-Za-z'\"*]+"  # operator
)


def _numbers(stack: list[bytes], n: int) -> list[float] | None:
    """Last n numeric operands from the stack, in operand order."""
    values: list[float] = []
    for operand in reversed(stack):
        try:
            values.append(float(operand))
        except ValueError:
            continue
        if len(values) == n:
            return values[::-1]
    return None


# --------------------------------------------------------------------------
# reading-order layout — loader/pdf/layout.ts port over text runs
# --------------------------------------------------------------------------

class _Region:
    """A text run as a positioned region (layout.ts createPositionedRegion).

    The renderer has per-glyph advance widths; without font metrics the run
    width is ESTIMATED as len(text) · size/2 (average half-em advance) —
    good enough for the column-gap geometry, documented as approximate."""

    __slots__ = ("y", "x", "seq", "text", "size", "left", "right", "top",
                 "bottom", "width", "height", "center_y")

    def __init__(self, y: float, x: float, seq: int, text: str, size: float):
        self.y, self.x, self.seq, self.text, self.size = y, x, seq, text, size
        est = 0.5 * size * len(text)
        self.left = x
        self.right = x + est
        self.top = y + size
        self.bottom = y
        self.width = est
        self.height = size
        self.center_y = y + size / 2.0


def _sort_top_left(regions: list[_Region]) -> list[_Region]:
    """layout.ts sortRegionsTopLeft — top-to-bottom with 1pt tolerance,
    left-to-right within a line; emission order (seq) breaks ties. Ordering
    uses the BASELINE y (identical sizes aside, top ≡ baseline ordering;
    baseline keeps mixed-size inline runs on one line, which the
    estimated-height top would split)."""
    from functools import cmp_to_key

    def cmp(a: _Region, b: _Region) -> float:
        delta = b.y - a.y
        if abs(delta) > 1.0:
            return delta
        if a.left != b.left:
            return a.left - b.left
        return a.seq - b.seq

    return sorted(regions, key=cmp_to_key(cmp))


def _median(values: list[float]) -> float:
    if not values:
        return 0.0
    ordered = sorted(values)
    mid = len(ordered) // 2
    if len(ordered) % 2:
        return ordered[mid]
    return (ordered[mid - 1] + ordered[mid]) / 2.0


def _find_horizontal_split(regions: list[_Region]):
    """layout.ts findHorizontalReadingSplit — a vertical whitespace band
    (> max(18, 2.5·median height)) splits top content from bottom."""
    if len(regions) < 3:
        return None
    ordered = _sort_top_left(regions)
    heights = [r.height for r in ordered if r.height > 0]
    baseline_gap = max(18.0, (_median(heights) or 12.0) * 2.5)
    running_bottom = ordered[0].bottom
    best_index, best_gap = -1, 0.0
    for index in range(1, len(ordered)):
        gap = running_bottom - ordered[index].top
        if gap > baseline_gap and gap > best_gap:
            best_gap, best_index = gap, index
        running_bottom = min(running_bottom, ordered[index].bottom)
    if best_index <= 0:
        return None
    return ordered[:best_index], ordered[best_index:]


def _merge_intervals(intervals: list[tuple[float, float]]) -> list[tuple[float, float]]:
    merged: list[list[float]] = []
    for start, end in sorted(intervals):
        if not merged or start > merged[-1][1] + 12.0:
            merged.append([start, end])
        else:
            merged[-1][1] = max(merged[-1][1], end)
    return [(s, e) for s, e in merged]


def _v_overlap(a: _Region, b: _Region, tolerance: float) -> bool:
    return min(a.top, b.top) - max(a.bottom, b.bottom) > -tolerance


def _find_vertical_split(regions: list[_Region], page_width: float):
    """layout.ts findVerticalReadingSplit — a persistent x gap between
    merged horizontal intervals of narrow regions splits left/right
    columns; regions straddling the gap are 'spanning'."""
    if len(regions) < 2:
        return None
    center_left, center_right = page_width * 0.45, page_width * 0.55
    narrow = [
        r for r in regions
        if r.left < page_width and r.right > 0
        and r.width <= page_width * 0.55
        and not (r.left < center_left and r.right > center_right)
    ]
    if len(narrow) < 2:
        return None
    merged = _merge_intervals([(r.left, r.right) for r in narrow])
    if len(merged) < 2:
        return None
    minimum_gap = max(12.0, page_width * 0.02)
    best = None
    for (s1, e1), (s2, _e2) in zip(merged, merged[1:]):
        gap = s2 - e1
        if gap >= minimum_gap and (best is None or gap > best[1] - best[0]):
            best = (e1, s2)
    if best is None:
        return None
    center = (best[0] + best[1]) / 2.0
    tolerance = max(6.0, (best[1] - best[0]) * 0.15)
    left = [r for r in regions if r.right <= center + tolerance]
    right = [r for r in regions if r.left >= center - tolerance]
    in_split = set(map(id, left)) | set(map(id, right))
    spanning = [r for r in regions if id(r) not in in_split]
    if not left or not right:
        return None
    if len(spanning) >= len(left) + len(right):
        return None
    parallel = any(
        _v_overlap(lr, rr, max(8.0, min(lr.height, rr.height)))
        for lr in left for rr in right
    )
    if not parallel:
        return None
    # run-granularity guard (not in layout.ts, which splits OCR/pdfjs
    # region boxes with real widths): a genuine column has several stacked
    # lines — a single positioned run on one baseline (e.g. the right half
    # of one visual line) must not be promoted to a column
    if _n_baselines(left) < 2 or _n_baselines(right) < 2:
        return None
    return left, right, spanning


def _n_baselines(regions: list[_Region]) -> int:
    count = 0
    last: float | None = None
    for y in sorted(r.y for r in regions):
        if last is None or y - last > 1.0:
            count += 1
            last = y
    return count


def _order_regions(regions: list[_Region], page_width: float,
                   depth: int) -> list[list[_Region]]:
    """layout.ts orderPositionedRegions → ordered GROUPS: concatenating the
    groups is the reading order; baseline line-clustering happens within a
    group only, so same-baseline runs in different columns never merge."""
    if len(regions) <= 1 or depth >= 8:
        return [_sort_top_left(regions)] if regions else []
    split = _find_vertical_split(regions, page_width)
    if split:
        return _order_with_vertical_split(split, page_width, depth + 1)
    hsplit = _find_horizontal_split(regions)
    if hsplit:
        return _order_regions(hsplit[0], page_width, depth + 1) + _order_regions(
            hsplit[1], page_width, depth + 1
        )
    return [_sort_top_left(regions)]


def _order_with_vertical_split(split, page_width: float,
                               depth: int) -> list[list[_Region]]:
    """layout.ts orderRegionsWithVerticalSplit — spanning regions (titles,
    full-width paragraphs) interleave between the column flows."""
    left, right, spanning = split
    if not spanning:
        return _order_regions(left, page_width, depth) + _order_regions(
            right, page_width, depth
        )
    ordered: list[list[_Region]] = []
    emitted: set[int] = set()
    non_spanning = left + right
    current_top = float("inf")

    def push(groups: list[list[_Region]]) -> None:
        for group in groups:
            fresh = [r for r in group if id(r) not in emitted]
            if fresh:
                emitted.update(map(id, fresh))
                ordered.append(fresh)

    for span in _sort_top_left(spanning):
        def belongs(r: _Region) -> bool:
            return _v_overlap(r, span, max(1.0, min(r.height, span.height) * 1.25))

        above = [
            r for r in non_spanning
            if id(r) not in emitted and r.center_y < current_top
            and r.center_y > span.top and not belongs(r)
        ]
        if above:
            push(_order_regions(above, page_width, depth))
        overlapping = [
            r for r in non_spanning
            if id(r) not in emitted and r.center_y < current_top and belongs(r)
        ]
        push([_sort_top_left(overlapping + [span])])
        current_top = span.bottom
    below = [
        r for r in non_spanning
        if id(r) not in emitted and r.center_y < current_top
    ]
    if below:
        push(_order_regions(below, page_width, depth))
    return ordered


def extract_content_text(content: bytes, fonts: dict | None = None,
                         page_width: float = 612.0,
                         page_height: float = 792.0,
                         with_tables: bool = True) -> str:
    """Walk a content stream's text operators into positioned runs, then
    assemble lines the way the reference does (loader/pdf/layout.ts
    sortRegionsTopLeft): runs sort top-to-bottom with a 1pt y tolerance,
    left-to-right within a line (emission order breaks ties), so text
    emitted out of visual order still reads correctly. Positions track the
    text line matrix through BT/Tm/Td/TD/TL/T*; ``'``/``\"`` perform their
    implicit T*.

    ``fonts`` maps font resource names to (ToUnicode cmap, code width);
    strings shown while such a font is selected (tracked through ``Tf``)
    decode code-by-code via the cmap, everything else as Latin-1.

    Known limit vs the reference: runs joined on a line are concatenated
    verbatim — inter-run space inference (text.ts
    shouldInsertSpaceBetweenChars) needs per-glyph advance widths from
    font metrics, which belong to the unported rasterizer half."""
    runs: list[_Region] = []
    stack: list[bytes] = []  # recent operands
    current_font: str | None = None
    tf_size = 12.0
    lm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)  # text line matrix [a b c d e f]
    leading = 0.0
    seq = 0

    def translate(tx: float, ty: float) -> None:
        nonlocal lm
        a, b, c, d, e, f = lm
        lm = (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)

    def decode_operand(operand: bytes) -> str | None:
        if operand[:1] == b"(":
            raw = _pdf_string_bytes(operand[1:-1])
        elif operand[:1] == b"<":
            hexstr = re.sub(rb"\s", b"", operand[1:-1])
            if len(hexstr) % 2:
                hexstr += b"0"
            raw = bytes.fromhex(hexstr.decode())
        else:
            return None
        cmap = fonts.get(current_font) if fonts and current_font else None
        if cmap is not None:
            return _apply_cmap(raw, cmap[0], cmap[1])
        return raw.decode("latin-1")

    def emit(text: str | None) -> None:
        nonlocal seq
        if text:
            size = max(abs(lm[3]) * tf_size, 1.0)
            runs.append(_Region(lm[5], lm[4], seq, text, size))
            seq += 1

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
        if op == b"BT":
            lm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        elif op == b"Tf":
            for operand in reversed(stack):
                if operand[:1] == b"/":
                    current_font = operand[1:].decode("latin-1")
                    break
            values = _numbers(stack, 1)
            if values and values[0] > 0:
                tf_size = values[0]
        elif op == b"Tm":
            values = _numbers(stack, 6)
            if values:
                lm = tuple(values)
        elif op in (b"Td", b"TD"):
            values = _numbers(stack, 2)
            if values:
                if op == b"TD":
                    leading = -values[1]
                translate(values[0], values[1])
        elif op == b"TL":
            values = _numbers(stack, 1)
            if values:
                leading = values[0]
        elif op == b"T*":
            translate(0.0, -leading)
        elif op in (b"Tj", b"'", b'"'):
            if op in (b"'", b'"'):
                translate(0.0, -leading)  # implicit T*
            for operand in reversed(stack):
                text = decode_operand(operand)
                if text is not None:
                    emit(text)
                    break
        elif op == b"TJ":
            start = 0
            for index in range(len(stack) - 1, -1, -1):
                if stack[index] == b"[":
                    start = index + 1
                    break
            pieces = [decode_operand(o) for o in stack[start:]]
            emit("".join(p for p in pieces if p is not None))
        stack = []

    # drawn-grid table reconstruction (loader/pdf/table.ts port, VERDICT
    # r4 #3): runs inside a detected table render as a markdown pipe table
    # at the table's reading-order position instead of loose lines
    table_md: dict[str, str] = {}
    if with_tables:
        from .pdf_tables import detect_tables

        for k, table in enumerate(detect_tables(content, runs, page_height)):
            bbox = table["bbox"]

            def inside(r, bbox=bbox):
                cx = (r.left + r.right) / 2.0
                cy = page_height - r.center_y
                return (
                    bbox["x0"] <= cx < bbox["x1"]
                    and bbox["top"] <= cy < bbox["bottom"]
                )

            runs = [r for r in runs if not inside(r)]
            sentinel = f"\x00TBL{k}\x00"
            table_md[sentinel] = table["markdown"]
            runs.append(
                _Region(
                    page_height - bbox["top"], bbox["x0"],
                    10_000_000 + k, sentinel, 1.0,
                )
            )

    # reading-order layout (layout.ts orderPositionedRegions): column /
    # band splits first, then per-group baseline clustering within 1pt —
    # same-baseline runs in DIFFERENT columns stay in their column's flow
    # instead of interleaving into one line (VERDICT r3 #6)
    lines: list[str] = []
    for group in _order_regions(runs, page_width, 0):
        current: list[str] = []
        line_y: float | None = None
        for region in group:
            if line_y is None or abs(region.y - line_y) > 1.0:
                joined = "".join(current)
                if joined.strip():
                    lines.append(joined)
                current = []
                line_y = region.y
            current.append(region.text)
        joined = "".join(current)
        if joined.strip():
            lines.append(joined)
    if table_md:
        # a sentinel may share its assembled line with a same-baseline run
        # (e.g. a caption within 1pt of the table top) — split around every
        # sentinel occurrence so neither the NUL marker leaks nor the
        # table is lost
        sentinel_re = re.compile("\x00TBL\\d+\x00")
        expanded: list[str] = []
        for line in lines:
            if "\x00TBL" not in line:
                expanded.append(line)
                continue
            pieces = sentinel_re.split(line)
            markers = sentinel_re.findall(line)
            for i, piece in enumerate(pieces):
                if piece.strip():
                    expanded.append(piece)
                if i < len(markers):
                    # blank-line fenced so the pipe table stands as a block
                    if expanded and expanded[-1] != "":
                        expanded.append("")
                    expanded.append(table_md.get(markers[i], ""))
                    expanded.append("")
        while expanded and expanded[-1] == "":
            expanded.pop()
        lines = expanded
    return "\n".join(lines)


def _page_box(page_body: bytes,
              objects: dict[int, tuple[bytes, bytes | None]]) -> tuple[float, float]:
    """/MediaBox (width, height), inherited via /Parent like /Resources;
    US-Letter 612×792pt when absent (the geometry only needs the scale)."""
    body = page_body
    seen: set[int] = set()
    while True:
        box = re.search(
            rb"/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)",
            body,
        )
        if box:
            try:
                width = abs(float(box.group(3)) - float(box.group(1)))
                height = abs(float(box.group(4)) - float(box.group(2)))
                if width > 0 and height > 0:
                    return width, height
            except ValueError:
                pass
        parent = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", body)
        if not parent:
            return 612.0, 792.0
        pnum = int(parent.group(1))
        if pnum in seen or pnum not in objects:
            return 612.0, 792.0
        seen.add(pnum)
        body = objects[pnum][0]




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
        fonts = _page_fonts(objects[num][0], objects)
        width, height = _page_box(objects[num][0], objects)
        text = extract_content_text(
            content, fonts, page_width=width, page_height=height
        ).strip()
        if text:
            parts.append(f":::PAGE-{index + 1}:::\n\n{text}")
    return "\n\n".join(parts)
