"""Scoped PDF text extraction tests (loader/pdf output shape:
:::PAGE-n:::-fenced page texts). Fixture PDFs are written byte-by-byte."""

from __future__ import annotations

import zlib

from kiwi_spark.functions.pdf_text import extract_content_text, pdf_to_text


def make_pdf(page_streams: list[str], compress: bool = False) -> bytes:
    n_pages = len(page_streams)
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs: list[tuple[int, bytes, bytes | None]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(), None),
    ]
    for i, stream in enumerate(page_streams):
        cid = 3 + n_pages + i
        objs.append(
            (3 + i,
             f"<< /Type /Page /Parent 2 0 R /Contents {cid} 0 R >>".encode(),
             None)
        )
        data = stream.encode("latin-1")
        if compress:
            data = zlib.compress(data)
            body = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            body = f"<< /Length {len(data)} >>".encode()
        objs.append((cid, body, data))
    out = [b"%PDF-1.4"]
    for num, body, stream in objs:
        piece = f"{num} 0 obj\n".encode() + body
        if stream is not None:
            piece += b"\nstream\n" + stream + b"\nendstream"
        piece += b"\nendobj"
        out.append(piece)
    out.append(b"%%EOF")
    return b"\n".join(out)


S1 = "BT /F1 12 Tf 72 720 Td (Hello PDF world.) Tj 0 -14 Td (Second line.) Tj ET"


def test_pdf_pages_and_lines():
    s2 = "BT [ (Kerned ) -120 (text) ] TJ T* (Next \\(esc\\) and \\101B) Tj ET"
    text = pdf_to_text(make_pdf([S1, s2]))
    assert text == (
        ":::PAGE-1:::\n\nHello PDF world.\nSecond line."
        "\n\n:::PAGE-2:::\n\nKerned text\nNext (esc) and AB"
    )


def test_pdf_flate_decode():
    assert pdf_to_text(make_pdf([S1], compress=True)) == (
        ":::PAGE-1:::\n\nHello PDF world.\nSecond line."
    )


def test_pdf_hex_strings_and_quote_ops():
    content = "BT <48656C6C6F> Tj (next) ' ET"
    assert extract_content_text(content.encode()) == "Hello\nnext"


def test_pdf_non_pdf_and_empty():
    assert pdf_to_text(b"not a pdf") == ""
    assert pdf_to_text(b"%PDF-1.4\n%%EOF") == ""


def test_pdf_dispatch_through_payload_to_text():
    from kiwi_spark.functions.loaders import payload_to_text

    text, ft = payload_to_text(make_pdf([S1]))
    assert ft == "pdf"
    assert "Hello PDF world." in text
    assert text.startswith(":::PAGE-1:::")
