"""OOXML loader tests — fixtures are minimal valid .docx/.xlsx/.pptx zips
built in-test; expectations mirror loader/__tests__/{doc,excel,ppt}.test.ts
for the in-scope surface (body text, headings, styles, lists, tables, page
fences, sheet visibility, slide titles)."""

from __future__ import annotations

import io
import zipfile

from kiwi_spark.functions.ooxml import (
    docx_to_markdown,
    pptx_to_markdown,
    xlsx_to_markdown,
)

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
R = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


def make_zip(files: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return buf.getvalue()


def make_docx(body_xml: str, styles_xml: str | None = None,
              numbering_xml: str | None = None) -> bytes:
    files = {
        "word/document.xml": f"<w:document {W}><w:body>{body_xml}</w:body></w:document>",
    }
    if styles_xml:
        files["word/styles.xml"] = f"<w:styles {W}>{styles_xml}</w:styles>"
    if numbering_xml:
        files["word/numbering.xml"] = f"<w:numbering {W}>{numbering_xml}</w:numbering>"
    return make_zip(files)


def _p(text: str, style: str | None = None, numpr: str | None = None) -> str:
    ppr = ""
    if style or numpr:
        ppr = "<w:pPr>"
        if style:
            ppr += f'<w:pStyle w:val="{style}"/>'
        if numpr:
            ppr += numpr
        ppr += "</w:pPr>"
    return f"<w:p>{ppr}<w:r><w:t>{text}</w:t></w:r></w:p>"


def test_docx_minimal_exact():
    # doc.test.ts:269 — expect(text).toBe(":::PAGE-1:::\n\nHello")
    assert docx_to_markdown(make_docx(_p("Hello"))) == ":::PAGE-1:::\n\nHello"


def test_docx_headings_tables_pagebreaks():
    styles = (
        '<w:style w:styleId="Heading1"><w:name w:val="heading 1"/></w:style>'
        '<w:style w:styleId="Title"><w:name w:val="Title"/></w:style>'
    )
    table = (
        "<w:tbl>"
        "<w:tr><w:tc><w:p><w:r><w:t>Name</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>Value</w:t></w:r></w:p></w:tc></w:tr>"
        "<w:tr><w:tc><w:p><w:r><w:t>Answer</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>42</w:t></w:r></w:p></w:tc></w:tr>"
        "</w:tbl>"
    )
    body = (
        _p("Doc Loader Title", style="Title")
        + _p("Alpha before image.")
        + table
        + '<w:p><w:r><w:br w:type="page"/></w:r></w:p>'
        + _p("Omega after break.")
    )
    text = docx_to_markdown(make_docx(body, styles_xml=styles))
    assert text.startswith(":::PAGE-1:::")
    assert "# Doc Loader Title" in text
    assert "Alpha before image." in text
    assert "| Name | Value |" in text
    assert "| --- | --- |" in text
    assert "| Answer | 42 |" in text
    assert ":::PAGE-2:::" in text
    assert "Omega after break." in text


def test_docx_run_formatting_and_hyperlink():
    body = (
        "<w:p><w:r><w:rPr><w:b/><w:i/></w:rPr><w:t>both</w:t></w:r></w:p>"
        "<w:p><w:r><w:rPr><w:strike/></w:rPr><w:t>gone</w:t></w:r></w:p>"
    )
    text = docx_to_markdown(make_docx(body))
    assert "***both***" in text
    assert "~~gone~~" in text


def test_docx_lists_ordered_and_bullet():
    numbering = (
        '<w:abstractNum w:abstractNumId="0">'
        '<w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl>'
        '<w:lvl w:ilvl="1"><w:numFmt w:val="bullet"/></w:lvl>'
        "</w:abstractNum>"
        '<w:num w:numId="5"><w:abstractNumId w:val="0"/></w:num>'
    )
    numpr0 = '<w:numPr><w:ilvl w:val="0"/><w:numId w:val="5"/></w:numPr>'
    numpr1 = '<w:numPr><w:ilvl w:val="1"/><w:numId w:val="5"/></w:numPr>'
    body = _p("First item", numpr=numpr0) + _p("Nested bullet", numpr=numpr1)
    text = docx_to_markdown(make_docx(body, numbering_xml=numbering))
    assert "1. First item" in text
    assert "  - Nested bullet" in text


def test_docx_empty_document():
    assert docx_to_markdown(make_docx("")) == ""


# --- xlsx --------------------------------------------------------------------

X = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
XR = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


def make_xlsx(sheets: list[tuple[str, str, str | None]],
              shared: list[str] | None = None) -> bytes:
    """sheets: (name, sheetData xml, state)."""
    sheet_decls = []
    rels = []
    files = {}
    for i, (name, data, state) in enumerate(sheets, start=1):
        state_attr = f' state="{state}"' if state else ""
        sheet_decls.append(
            f'<sheet name="{name}" sheetId="{i}"{state_attr} r:id="rId{i}"/>'
        )
        rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
        files[f"xl/worksheets/sheet{i}.xml"] = (
            f"<worksheet {X}><sheetData>{data}</sheetData></worksheet>"
        )
    files["xl/workbook.xml"] = (
        f"<workbook {X} {XR}><sheets>{''.join(sheet_decls)}</sheets></workbook>"
    )
    files["xl/_rels/workbook.xml.rels"] = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        f'relationships">{"".join(rels)}</Relationships>'
    )
    if shared:
        items = "".join(f"<si><t>{s}</t></si>" for s in shared)
        files["xl/sharedStrings.xml"] = (
            f"<sst {X} count=\"{len(shared)}\">{items}</sst>"
        )
    return make_zip(files)


def _row(r: int, cells: list[tuple[str, str, str]], hidden: bool = False) -> str:
    attrs = f' r="{r}"' + (' hidden="1"' if hidden else "")
    body = "".join(
        f'<c r="{col}{r}" t="{t}"><v>{v}</v></c>' if t != "inlineStr"
        else f'<c r="{col}{r}" t="inlineStr"><is><t>{v}</t></is></c>'
        for col, t, v in cells
    )
    return f"<row{attrs}>{body}</row>"


def test_xlsx_sheets_visibility_and_values():
    shared = ["Foo", "Bar", "Secret"]
    summary = _row(1, [("A", "s", "0"), ("B", "inlineStr", "Amount")]) + _row(
        2, [("A", "s", "1"), ("B", "n", "42")]
    )
    hidden_sheet = _row(1, [("A", "s", "2")])
    details = (
        _row(1, [("A", "inlineStr", "Key"), ("B", "inlineStr", "Val")])
        + _row(2, [("A", "inlineStr", "visible"), ("B", "n", "1.5")])
        + _row(3, [("A", "inlineStr", "Secret row"), ("B", "n", "9")], hidden=True)
    )
    data = make_xlsx(
        [("Summary", summary, None), ("Hidden", hidden_sheet, "hidden"),
         ("Details", details, None)],
        shared=shared,
    )
    text = xlsx_to_markdown(data)
    assert "## Sheet: Summary" in text
    assert "## Sheet: Details" in text
    assert "## Sheet: Hidden" not in text
    assert "Secret" not in text
    assert "| Foo | Amount |" in text
    assert "| Bar | 42 |" in text
    assert "Secret row" not in text
    assert "| visible | 1.5 |" in text


def test_xlsx_boolean_and_empty():
    data = make_xlsx(
        [("S", _row(1, [("A", "inlineStr", "Flag")]) + _row(2, [("A", "b", "1")]), None)]
    )
    text = xlsx_to_markdown(data)
    assert "TRUE" in text
    assert xlsx_to_markdown(make_xlsx([("Empty", "", None)])) == ""


# --- pptx --------------------------------------------------------------------

A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
P = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'


def make_pptx(slides: list[str]) -> bytes:
    files = {
        f"ppt/slides/slide{i}.xml": xml for i, xml in enumerate(slides, start=1)
    }
    return make_zip(files)


def _slide(shapes: str) -> str:
    return (
        f"<p:sld {P} {A}><p:cSld><p:spTree>{shapes}</p:spTree></p:cSld></p:sld>"
    )


def _shape(text: str, ph_type: str | None = None) -> str:
    ph = f'<p:ph type="{ph_type}"/>' if ph_type else "<p:ph/>"
    return (
        "<p:sp><p:nvSpPr><p:nvPr>" + ph + "</p:nvPr></p:nvSpPr>"
        f"<p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>"
    )


def test_pptx_title_exact():
    # ppt.test.ts:232 — toBe(":::PAGE-1:::\n\n# Alpha Beta Gamma Delta")
    data = make_pptx([_slide(_shape("Alpha Beta Gamma Delta", "title"))])
    assert pptx_to_markdown(data) == ":::PAGE-1:::\n\n# Alpha Beta Gamma Delta"


def test_pptx_multiple_slides_and_untitled():
    data = make_pptx(
        [
            _slide(_shape("Quarterly review", "title") + _shape("Intro paragraph")),
            _slide(_shape("Body only text")),
        ]
    )
    text = pptx_to_markdown(data)
    assert "# Quarterly review" in text
    assert "Intro paragraph" in text
    assert ":::PAGE-2:::" in text
    assert "## Slide 2" in text
    assert "Body only text" in text


def test_pptx_empty_slides_skipped():
    data = make_pptx([_slide(""), _slide(_shape("Content", "title"))])
    text = pptx_to_markdown(data)
    assert ":::PAGE-1:::" not in text
    assert ":::PAGE-2:::" in text
    assert "# Content" in text


# --- ODF (odt / odp) ----------------------------------------------------------

T = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
O = 'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
TB = 'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
D = 'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"'
PR = 'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0"'


def make_odt(body: str, mimetype: str = "application/vnd.oasis.opendocument.text",
             styles: str = "") -> bytes:
    content = (
        f"<office:document-content {O} {T} {TB}>{styles}"
        f"<office:body><office:text>{body}</office:text></office:body>"
        "</office:document-content>"
    )
    return make_zip({"mimetype": mimetype, "content.xml": content})


def test_odt_headings_lists_tables():
    from kiwi_spark.functions.ooxml import odt_to_markdown

    styles = (
        '<text:list-style style:name="Num1" xmlns:style="urn:s">'
        '<text:list-level-style-number text:level="1"/></text:list-style>'
    )
    body = (
        '<text:h text:outline-level="2">Section Title</text:h>'
        "<text:p>Alpha paragraph.</text:p>"
        '<text:list text:style-name="Num1">'
        "<text:list-item><text:p>First item</text:p></text:list-item>"
        "<text:list-item><text:p>Second item</text:p>"
        "<text:list><text:list-item><text:p>Nested</text:p></text:list-item></text:list>"
        "</text:list-item></text:list>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>Name</text:p></table:table-cell>"
        "<table:table-cell><text:p>Qty</text:p></table:table-cell>"
        "</table:table-row><table:table-row>"
        "<table:table-cell><text:p>Widget</text:p></table:table-cell>"
        "<table:table-cell><text:p>42</text:p></table:table-cell>"
        "</table:table-row></table:table>"
    )
    text = odt_to_markdown(make_odt(body, styles=styles))
    assert "## Section Title" in text
    assert "Alpha paragraph." in text
    assert "1. First item" in text
    assert "1. Second item" in text
    assert "1. Nested" in text  # inherits ordered style (no own style name)
    assert "| Name | Qty |" in text
    assert "| Widget | 42 |" in text


def test_odt_text_s_and_tab_expansion():
    from kiwi_spark.functions.ooxml import odt_to_markdown

    body = '<text:p>A<text:s text:c="3"/>B<text:tab/>C</text:p>'
    text = odt_to_markdown(make_odt(body))
    assert "A B C" in text  # cleanInlineText squashes runs


def test_odp_slides_and_titles():
    from kiwi_spark.functions.ooxml import odp_to_markdown

    content = (
        f"<office:document-content {O} {T} {D} {PR}>"
        "<office:body><office:presentation>"
        '<draw:page><draw:frame presentation:class="title">'
        "<draw:text-box><text:p>Roadmap 2026</text:p></draw:text-box></draw:frame>"
        "<draw:frame><draw:text-box><text:p>Intro paragraph</text:p>"
        "</draw:text-box></draw:frame></draw:page>"
        "<draw:page><draw:frame><draw:text-box><text:p>No title here</text:p>"
        "</draw:text-box></draw:frame></draw:page>"
        "</office:presentation></office:body></office:document-content>"
    )
    data = make_zip(
        {"mimetype": "application/vnd.oasis.opendocument.presentation",
         "content.xml": content}
    )
    text = odp_to_markdown(data)
    assert "# Roadmap 2026" in text
    assert "Intro paragraph" in text
    assert "## Slide 2" in text
    assert "No title here" in text


def test_odf_format_detection_and_dispatch():
    from kiwi_spark.functions.format_detect import detect_format
    from kiwi_spark.functions.loaders import payload_to_text

    odt = make_odt("<text:p>Hello ODT</text:p>")
    assert detect_format(content=odt) == "odt"
    text, ft = payload_to_text(odt)
    assert ft == "odt" and "Hello ODT" in text
