"""OOXML loaders: .docx / .xlsx / .pptx bytes → the reference's markdown.

Scoped ports of the reference's OOXML family (loader/doc/*, loader/excel/*,
loader/ppt/* — the rendered output shapes are matched 1:1; the zip+XML
mechanics use Python's stdlib ``zipfile`` + ``xml.etree`` instead of the
xlsx/ooxml npm packages):

* docx — body paragraphs with Heading styles, run formatting
  (bold/italic/strike/underline, hyperlinks), numbered/bulleted lists
  (numbering.xml numFmt), tables as markdown with the header-row heuristic,
  page fences ``:::PAGE-n:::`` on explicit/rendered page breaks, images as
  ``:::IMG-n:::`` markers (doc/render.ts:8-66, doc/blocks.ts:36-50)
* xlsx — one ``## Sheet: name`` section per visible sheet with a markdown
  table (shared strings, inline strings, numbers, booleans; hidden
  rows/sheets skipped) (excel/document.ts:33-130, excel/render.ts)
* pptx — per slide: page fence, title as ``# …`` (else ``## Slide n``),
  text-frame paragraphs/bullets, tables (ppt/render.ts:5-43)

* odt/odp — ODF text/presentation (content.xml): headings by outline
  level, nested lists with number/bullet styles, tables, per-slide titles
  (odt.ts:694-747, odp.ts:701-745)

NOT ported (needs OLE/CFB or OCR models): legacy .doc/.xls/.ppt binaries,
headers/footers/footnotes/comments, field codes, embedded-image OCR.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _children(element, name: str):
    return [c for c in element if _local(c.tag) == name]


def _find(element, name: str):
    for child in element:
        if _local(child.tag) == name:
            return child
    return None


def _descendants(element, name: str):
    return [d for d in element.iter() if _local(d.tag) == name]


def _attr(element, name: str) -> str | None:
    for key, value in element.attrib.items():
        if _local(key) == name:
            return value
    return None


def _read_xml(zf: zipfile.ZipFile, path: str):
    try:
        data = zf.read(path)
    except KeyError:
        return None
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError:
        return None


def clean_inline_text(value: str) -> str:
    """doc/text.ts cleanInlineText: per-line whitespace squash, interior
    blank lines kept, edge blank lines dropped."""
    lines = [
        re.sub(r"\s+", " ", line).strip()
        for line in value.replace("\r", "").split("\n")
    ]
    kept = [
        line
        for index, line in enumerate(lines)
        if line or (0 < index < len(lines) - 1)
    ]
    return "\n".join(kept)


def _escape_cell(value: str) -> str:
    return value.replace("|", "\\|")


def looks_like_header_row(rows: list[list[str]]) -> bool:
    """doc/blocks.ts:36-50."""
    if len(rows) < 2:
        return False
    first, second = rows[0], rows[1]
    if not first or any(len(cell) == 0 for cell in first):
        return False
    num = re.compile(r"^[-+]?\d+(?:[.,]\d+)?$")
    first_numeric = all(num.match(cell) for cell in first)
    second_different = any(num.match(cell) or len(cell) == 0 for cell in second)
    return not first_numeric and second_different


def rows_to_markdown(rows: list[list[str]], has_header: bool = True) -> str:
    """doc/render.ts:48-66."""
    if not rows:
        return ""
    column_count = max(len(row) for row in rows)
    if column_count <= 0:
        return ""
    header = rows[0] if has_header else []
    body = rows[1:] if has_header else rows

    def render_row(row: list[str]) -> str:
        cells = [
            _escape_cell(
                clean_inline_text(re.sub(r"\s*\n\s*", " ", row[i] if i < len(row) else ""))
            )
            for i in range(column_count)
        ]
        return "| " + " | ".join(cells) + " |"

    lines = [render_row(header), "| " + " | ".join(["---"] * column_count) + " |"]
    lines += [render_row(row) for row in body]
    return "\n".join(lines)


def _page_fence(page: int) -> str:
    return f":::PAGE-{page}:::"


class _MarkdownBuilder:
    def __init__(self) -> None:
        self.parts: list[str] = []

    def append(self, value: str) -> None:
        if value.strip():
            self.parts.append(value)

    def text(self) -> str:
        return "\n\n".join(self.parts)


# --------------------------------------------------------------------------
# docx
# --------------------------------------------------------------------------

_HEADING_STYLE = re.compile(r"^(?:heading|berschrift)\s*(\d)$", re.IGNORECASE)


def _docx_styles(zf: zipfile.ZipFile) -> dict[str, int]:
    """styleId → heading level from word/styles.xml (scoped: style name or
    id matching Heading N / Title)."""
    root = _read_xml(zf, "word/styles.xml")
    levels: dict[str, int] = {}
    if root is None:
        return levels
    for style in _descendants(root, "style"):
        style_id = _attr(style, "styleId") or ""
        name_el = _find(style, "name")
        name = (_attr(name_el, "val") if name_el is not None else "") or style_id
        m = _HEADING_STYLE.match(name.replace(" ", "")) or _HEADING_STYLE.match(
            style_id.replace(" ", "")
        )
        if m:
            levels[style_id] = int(m.group(1))
        elif name.lower() == "title":
            levels[style_id] = 1
    return levels


def _docx_numbering(zf: zipfile.ZipFile) -> dict[str, dict[int, bool]]:
    """numId → {ilvl → ordered?} via numbering.xml numFmt (bullet → False)."""
    root = _read_xml(zf, "word/numbering.xml")
    if root is None:
        return {}
    abstract: dict[str, dict[int, bool]] = {}
    for anum in _descendants(root, "abstractNum"):
        aid = _attr(anum, "abstractNumId") or ""
        levels: dict[int, bool] = {}
        for lvl in _children(anum, "lvl"):
            ilvl = int(_attr(lvl, "ilvl") or 0)
            fmt = _find(lvl, "numFmt")
            val = (_attr(fmt, "val") if fmt is not None else "bullet") or "bullet"
            levels[ilvl] = val not in ("bullet", "none")
        abstract[aid] = levels
    mapping: dict[str, dict[int, bool]] = {}
    for num in _descendants(root, "num"):
        nid = _attr(num, "numId") or ""
        ref = _find(num, "abstractNumId")
        aid = (_attr(ref, "val") if ref is not None else "") or ""
        mapping[nid] = abstract.get(aid, {})
    return mapping


def _docx_hyperlinks(zf: zipfile.ZipFile) -> dict[str, str]:
    root = _read_xml(zf, "word/_rels/document.xml.rels")
    targets: dict[str, str] = {}
    if root is None:
        return targets
    for rel in _descendants(root, "Relationship"):
        rid = rel.get("Id") or ""
        if (rel.get("Type") or "").endswith("/hyperlink"):
            targets[rid] = rel.get("Target") or ""
    return targets


def _run_text(run, markdown: bool) -> tuple[str, bool]:
    """(text, contains_page_break) for one w:r."""
    pieces: list[str] = []
    page_break = False
    rpr = _find(run, "rPr")
    fmt = {"bold": False, "italic": False, "strike": False, "underline": False}
    if rpr is not None:
        for child in rpr:
            name = _local(child.tag)
            off = (_attr(child, "val") or "").lower() in ("0", "false", "none")
            if name == "b" and not off:
                fmt["bold"] = True
            elif name == "i" and not off:
                fmt["italic"] = True
            elif name == "strike" and not off:
                fmt["strike"] = True
            elif name == "u" and not off:
                fmt["underline"] = True
    for child in run:
        name = _local(child.tag)
        if name == "t":
            pieces.append(child.text or "")
        elif name == "tab":
            pieces.append("\t")
        elif name == "br":
            if (_attr(child, "type") or "") == "page":
                page_break = True
            else:
                pieces.append("\n")
        elif name == "lastRenderedPageBreak":
            page_break = True
    text = "".join(pieces)
    if markdown and text.strip() and any(fmt.values()):
        lead = re.match(r"^\s*", text).group(0)
        trail = re.search(r"\s*$", text).group(0)
        core = text.strip()
        if fmt["bold"] and fmt["italic"]:
            core = f"***{core}***"
        elif fmt["bold"]:
            core = f"**{core}**"
        elif fmt["italic"] or fmt["underline"]:
            core = f"*{core}*"
        if fmt["strike"]:
            core = f"~~{core}~~"
        text = f"{lead}{core}{trail}"
    return text, page_break


def _paragraph_text(par, hyperlinks: dict[str, str], markdown: bool) -> tuple[str, bool]:
    pieces: list[str] = []
    page_break = False
    for child in par:
        name = _local(child.tag)
        if name == "r":
            text, brk = _run_text(child, markdown)
            pieces.append(text)
            page_break = page_break or brk
        elif name == "hyperlink":
            rid = _attr(child, "id")
            target = hyperlinks.get(rid or "", "")
            inner = []
            for run in _children(child, "r"):
                text, brk = _run_text(run, markdown=False)
                inner.append(text)
                page_break = page_break or brk
            label = "".join(inner).strip()
            if label:
                pieces.append(f"[{label}]({target})" if markdown and target else label)
    return "".join(pieces), page_break


def _docx_blocks(body, zf: zipfile.ZipFile, markdown: bool = True) -> list[dict]:
    styles = _docx_styles(zf)
    numbering = _docx_numbering(zf)
    hyperlinks = _docx_hyperlinks(zf)
    blocks: list[dict] = []

    def walk(container) -> None:
        for child in container:
            name = _local(child.tag)
            if name == "p":
                ppr = _find(child, "pPr")
                heading = None
                num_info = None
                if ppr is not None:
                    pstyle = _find(ppr, "pStyle")
                    if pstyle is not None:
                        heading = styles.get(_attr(pstyle, "val") or "")
                    numpr = _find(ppr, "numPr")
                    if numpr is not None:
                        ilvl_el = _find(numpr, "ilvl")
                        numid_el = _find(numpr, "numId")
                        ilvl = int(_attr(ilvl_el, "val") or 0) if ilvl_el is not None else 0
                        numid = _attr(numid_el, "val") or "" if numid_el is not None else ""
                        ordered = numbering.get(numid, {}).get(ilvl, False)
                        num_info = (ilvl, ordered)
                text, page_break = _paragraph_text(child, hyperlinks, markdown)
                text = clean_inline_text(text)
                if text:
                    if heading:
                        blocks.append({"kind": "heading", "level": heading, "text": text})
                    elif num_info is not None:
                        blocks.append(
                            {"kind": "bullet", "level": num_info[0],
                             "ordered": num_info[1], "text": text}
                        )
                    else:
                        blocks.append({"kind": "paragraph", "text": text})
                if page_break:
                    blocks.append({"kind": "pageBreak"})
            elif name == "tbl":
                rows = []
                for tr in _children(child, "tr"):
                    row = []
                    for tc in _children(tr, "tc"):
                        cell_parts = []
                        for par in _descendants(tc, "p"):
                            text, _ = _paragraph_text(par, hyperlinks, markdown=False)
                            if text.strip():
                                cell_parts.append(text.strip())
                        row.append(clean_inline_text(" ".join(cell_parts)))
                    rows.append(row)
                if rows:
                    blocks.append(
                        {"kind": "table", "rows": rows,
                         "hasHeader": looks_like_header_row(rows)}
                    )
            elif name == "sectPr":
                continue
    walk(body)
    return blocks


def docx_to_markdown(data: bytes) -> str:
    """doc/render.ts:8-46 rendering over the scoped block parser."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "word/document.xml")
        if root is None:
            return ""
        body = next(iter(_descendants(root, "body")), None)
        if body is None:
            return ""
        blocks = _docx_blocks(body, zf)
    if not any(b["kind"] != "pageBreak" for b in blocks):
        return ""
    builder = _MarkdownBuilder()
    page = 1
    builder.append(_page_fence(page))
    for block in blocks:
        kind = block["kind"]
        if kind == "pageBreak":
            page += 1
            builder.append(_page_fence(page))
        elif kind == "heading":
            builder.append("#" * max(1, min(6, block["level"])) + f" {block['text']}")
        elif kind == "paragraph":
            builder.append(block["text"])
        elif kind == "bullet":
            indent = "  " * max(0, block["level"])
            marker = "1." if block["ordered"] else "-"
            builder.append(f"{indent}{marker} {block['text']}")
        elif kind == "table":
            builder.append(rows_to_markdown(block["rows"], block["hasHeader"]))
    return builder.text()


# --------------------------------------------------------------------------
# xlsx
# --------------------------------------------------------------------------

def _xlsx_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    root = _read_xml(zf, "xl/sharedStrings.xml")
    if root is None:
        return []
    out = []
    for si in _children(root, "si"):
        out.append("".join(t.text or "" for t in _descendants(si, "t")))
    return out


def _col_index(address: str) -> int:
    index = 0
    for ch in address:
        if ch.isalpha():
            index = index * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return index - 1


def _format_number(value: str) -> str:
    try:
        num = float(value)
    except ValueError:
        return value
    if num == int(num) and abs(num) < 1e15:
        return str(int(num))
    return value


def xlsx_to_markdown(data: bytes) -> str:
    """excel/document.ts:33-130 — '## Sheet: name' + markdown table per
    visible sheet, hidden rows skipped, shared/inline strings resolved."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        workbook = _read_xml(zf, "xl/workbook.xml")
        if workbook is None:
            return ""
        rels_root = _read_xml(zf, "xl/_rels/workbook.xml.rels")
        rel_targets = {}
        if rels_root is not None:
            for rel in _descendants(rels_root, "Relationship"):
                target = rel.get("Target") or ""
                if target.startswith("/"):
                    target = target[1:]
                else:
                    target = "xl/" + target
                rel_targets[rel.get("Id") or ""] = target
        shared = _xlsx_shared_strings(zf)
        sections: list[str] = []
        for sheet in _descendants(workbook, "sheet"):
            if (_attr(sheet, "state") or "visible") != "visible":
                continue
            name = _attr(sheet, "name") or "Sheet"
            rid = _attr(sheet, "id") or ""
            path = rel_targets.get(rid)
            root = _read_xml(zf, path) if path else None
            if root is None:
                continue
            rows: list[list[str]] = []
            for row in _descendants(root, "row"):
                if (_attr(row, "hidden") or "") in ("1", "true"):
                    continue
                cells: list[str] = []
                for cell in _children(row, "c"):
                    ref = _attr(cell, "r") or ""
                    col = _col_index(ref) if ref else len(cells)
                    while len(cells) < col:
                        cells.append("")
                    ctype = _attr(cell, "t") or "n"
                    v = _find(cell, "v")
                    value = ""
                    if ctype == "s" and v is not None:
                        idx = int(v.text or "0")
                        value = shared[idx] if idx < len(shared) else ""
                    elif ctype == "inlineStr":
                        is_el = _find(cell, "is")
                        if is_el is not None:
                            value = "".join(
                                t.text or "" for t in _descendants(is_el, "t")
                            )
                    elif ctype == "b" and v is not None:
                        value = "TRUE" if (v.text or "") == "1" else "FALSE"
                    elif v is not None:
                        value = _format_number(v.text or "")
                    cells.append(value.strip())
                if any(cells):
                    rows.append(cells)
            if not rows:
                continue
            width = max(len(r) for r in rows)
            rows = [r + [""] * (width - len(r)) for r in rows]
            table = rows_to_markdown(rows, looks_like_header_row(rows))
            sections.append(f"## Sheet: {name}\n\n{table}")
        return "\n\n".join(sections)


# --------------------------------------------------------------------------
# pptx
# --------------------------------------------------------------------------

def _pptx_shape_paragraphs(shape) -> list[str]:
    out = []
    for par in _descendants(shape, "p"):
        if _local(par.tag) != "p":
            continue
        text = "".join(
            t.text or ""
            for t in par.iter()
            if _local(t.tag) == "t"
        )
        text = clean_inline_text(text)
        if text:
            out.append(text)
    return out


def pptx_to_markdown(data: bytes) -> str:
    """ppt/render.ts:5-43 — page fence per slide, placeholder title as
    '# …' (else '## Slide n'), text paragraphs, tables."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        slide_paths = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        builder = _MarkdownBuilder()
        for index, path in enumerate(slide_paths):
            root = _read_xml(zf, path)
            if root is None:
                continue
            parts: list[str] = []
            has_title = False
            for sp in _descendants(root, "sp"):
                ph = next(
                    (p for p in _descendants(sp, "ph")), None
                )
                ph_type = _attr(ph, "type") if ph is not None else None
                paragraphs = _pptx_shape_paragraphs(sp)
                if not paragraphs:
                    continue
                if ph_type in ("title", "ctrTitle"):
                    has_title = True
                    parts.append(f"# {paragraphs[0]}")
                    parts.extend(paragraphs[1:])
                else:
                    parts.extend(paragraphs)
            for tbl in _descendants(root, "tbl"):
                rows = []
                for tr in _children(tbl, "tr"):
                    row = []
                    for tc in _children(tr, "tc"):
                        row.append(" ".join(_pptx_shape_paragraphs(tc)))
                    rows.append(row)
                if rows:
                    parts.append(rows_to_markdown(rows, looks_like_header_row(rows)))
            if not parts:
                continue
            builder.append(_page_fence(index + 1))
            if not has_title:
                builder.append(f"## Slide {index + 1}")
            for part in parts:
                builder.append(part)
        return builder.text()


# --------------------------------------------------------------------------
# ODF (odt / odp)
# --------------------------------------------------------------------------

def _odf_text_content(element) -> str:
    """Paragraph text with text:s (run of spaces) and text:tab expanded."""
    pieces: list[str] = []

    def walk(node) -> None:
        if node.text:
            pieces.append(node.text)
        for child in node:
            name = _local(child.tag)
            if name == "s":
                count = int(_attr(child, "c") or 1)
                pieces.append(" " * count)
            elif name == "tab":
                pieces.append("\t")
            elif name == "line-break":
                pieces.append("\n")
            else:
                walk(child)
            if child.tail:
                pieces.append(child.tail)

    walk(element)
    return "".join(pieces)


def _odf_list_styles(root) -> dict[str, bool]:
    """list style name → ordered? (first level number vs bullet)."""
    styles: dict[str, bool] = {}
    for style in _descendants(root, "list-style"):
        name = _attr(style, "name") or ""
        ordered = any(
            _local(c.tag) == "list-level-style-number" for c in style
        )
        styles[name] = ordered
    return styles


def _odf_blocks(container, list_styles: dict[str, bool],
                level: int = 0, list_ordered: bool | None = None) -> list[dict]:
    blocks: list[dict] = []
    for child in container:
        name = _local(child.tag)
        if name == "h":
            text = clean_inline_text(_odf_text_content(child))
            if text:
                blocks.append(
                    {
                        "kind": "heading",
                        "level": int(_attr(child, "outline-level") or 1),
                        "text": text,
                    }
                )
        elif name == "p":
            text = clean_inline_text(_odf_text_content(child))
            if text:
                if list_ordered is None:
                    blocks.append({"kind": "paragraph", "text": text})
                else:
                    blocks.append(
                        {"kind": "bullet", "level": level - 1,
                         "ordered": list_ordered, "text": text}
                    )
        elif name == "list":
            style = _attr(child, "style-name") or ""
            ordered = list_styles.get(style, list_ordered or False)
            for item in _children(child, "list-item"):
                blocks += _odf_blocks(item, list_styles, level + 1, ordered)
        elif name == "table":
            rows = []
            for tr in _descendants(child, "table-row"):
                row = []
                for tc in _children(tr, "table-cell"):
                    row.append(
                        clean_inline_text(
                            " ".join(
                                _odf_text_content(p)
                                for p in _descendants(tc, "p")
                            )
                        )
                    )
                rows.append(row)
            if rows:
                blocks.append({"kind": "table", "rows": rows})
        elif name in ("section", "frame", "text-box"):
            blocks += _odf_blocks(child, list_styles, level, list_ordered)
    return blocks


def _render_odf_blocks(blocks: list[dict], slide_mode: bool = False) -> list[str]:
    out: list[str] = []
    for block in blocks:
        kind = block["kind"]
        if kind == "heading":
            if slide_mode:
                out.append(f"# {block['text']}")
            else:
                out.append(
                    "#" * max(1, min(6, block["level"])) + f" {block['text']}"
                )
        elif kind == "paragraph":
            out.append(block["text"])
        elif kind == "bullet":
            indent = "  " * max(0, block["level"])
            marker = "1." if block["ordered"] else "-"
            out.append(f"{indent}{marker} {block['text']}")
        elif kind == "table":
            out.append(rows_to_markdown(block["rows"], has_header=True))
    return out


def odt_to_markdown(data: bytes) -> str:
    """odt.ts:694-716 rendering over content.xml office:text."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "content.xml")
    if root is None:
        return ""
    body = next(iter(_descendants(root, "text")), None)
    if body is None:
        return ""
    list_styles = _odf_list_styles(root)
    return "\n\n".join(
        p for p in _render_odf_blocks(_odf_blocks(body, list_styles)) if p.strip()
    ).strip()


def odp_to_markdown(data: bytes) -> str:
    """odp.ts:701-745 — '# title' per titled slide, '## Slide n' otherwise."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "content.xml")
    if root is None:
        return ""
    presentation = next(iter(_descendants(root, "presentation")), None)
    if presentation is None:
        return ""
    list_styles = _odf_list_styles(root)
    parts: list[str] = []
    for index, page in enumerate(_children(presentation, "page")):
        blocks: list[dict] = []
        for frame in _descendants(page, "frame"):
            cls = _attr(frame, "class") or ""
            frame_blocks = _odf_blocks(frame, list_styles)
            if cls in ("title", "subtitle") and frame_blocks:
                text = " ".join(
                    b["text"] for b in frame_blocks if b.get("text")
                ).strip()
                if text:
                    blocks.append({"kind": "heading", "level": 1, "text": text})
                continue
            blocks += frame_blocks
        if not blocks:
            continue
        has_title = any(b["kind"] == "heading" for b in blocks)
        rendered: list[str] = []
        if not has_title:
            rendered.append(f"## Slide {index + 1}")
        rendered += _render_odf_blocks(blocks, slide_mode=True)
        parts.append("\n\n".join(p for p in rendered if p.strip()))
    return "\n\n".join(p for p in parts if p.strip()).strip()
