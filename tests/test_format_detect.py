from kiwi_spark.functions.format_detect import detect_format


def test_content_sniff_priority():
    assert detect_format(b"<!DOCTYPE html><html>...") == "html"
    assert detect_format(b"  <html lang='en'>") == "html"
    assert detect_format(b"%PDF-1.7 ...") == "pdf"
    assert detect_format(b"\x89PNG\r\n\x1a\nxxxx") == "image"
    assert detect_format(b'{"a": 1}') == "json"
    assert detect_format(b"BEGIN:VCALENDAR\n") == "calendar"
    # sniff beats declared mime
    assert detect_format(b"<html>", mime="text/plain") == "html"


def test_mime_and_extension_fallback():
    assert detect_format(mime="text/markdown") == "markdown"
    assert detect_format(mime="application/json; charset=utf-8") == "json"
    assert detect_format(url="https://x.example/a/b.csv?q=1") == "csv"
    assert detect_format(url="https://x.example/report.PDF") == "pdf"
    assert detect_format(b"just some words") == "text"
    assert detect_format() == "text"


def test_web_format_factory_sniffs():
    """Ported from loader/__tests__/web-format-factory.test.ts:5-37 — the
    content sniff wins over a declared text/plain mime."""
    from kiwi_spark.functions.format_detect import detect_format

    assert detect_format(
        content=b"<!doctype html><html><body>Hi</body></html>", mime="text/plain"
    ) == "html"
    assert detect_format(
        content=b"Subject: Hello\nFrom: a@example.com\n\nBody", mime="text/plain"
    ) == "email"
    assert detect_format(
        content=b"BEGIN:VCALENDAR\nBEGIN:VEVENT\nSUMMARY:Hi\nEND:VEVENT\nEND:VCALENDAR",
        mime="text/plain",
    ) == "calendar"
    assert detect_format(
        content=b"BEGIN:VCARD\nFN:Alice\nEND:VCARD", mime="text/plain"
    ) == "vcard"


def test_email_header_block_needs_route_header():
    from kiwi_spark.functions.format_detect import detect_format

    # Subject+Date but no routing header → NOT email (factory.ts:546)
    assert detect_format(content=b"Subject: X\nDate: today\n\nBody") != "email"
    # a colon-prefixed non-header line breaks the block
    assert detect_format(content=b"note: this is prose\ntext follows") != "email"


def test_routed_format_loaders_end_to_end():
    """web-format-factory.test.ts:40-67 — detected loaders produce the
    expected markdown shapes."""
    from kiwi_spark.functions.loaders import payload_to_text

    text, ft = payload_to_text(b"<html><body><h1>Hello</h1></body></html>")
    assert ft == "html" and "# Hello" in text
    text, ft = payload_to_text(b"Subject: Hi\nFrom: a@example.com\n\nBody")
    assert ft == "email" and "# Email Message" in text
    text, ft = payload_to_text(
        b"BEGIN:VCALENDAR\nBEGIN:VEVENT\nSUMMARY:Meet\nEND:VEVENT\nEND:VCALENDAR"
    )
    assert ft == "calendar" and "## Event 1: Meet" in text
    text, ft = payload_to_text(b"BEGIN:VCARD\nFN:Alice\nEND:VCARD")
    assert ft == "vcard" and "## Contact 1: Alice" in text


def test_xhtml_with_xml_declaration_routes_to_html():
    """ADVICE r2: XHTML opens with an XML declaration before the html root —
    it must stay on the byte-exact HTML path (the reference never sniffs
    <?xml at all, factory.ts:484-518)."""
    xhtml = (
        b'<?xml version="1.0" encoding="UTF-8"?>\n'
        b'<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
        b'"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">\n'
        b'<html xmlns="http://www.w3.org/1999/xhtml"><body>Hi</body></html>'
    )
    assert detect_format(content=xhtml) == "html"
    # declaration straight into <html> (no doctype), with a comment between
    assert detect_format(
        content=b'<?xml version="1.0"?><!-- generator --><html><body>x</body></html>'
    ) == "html"
    # a real xml document still routes to xml
    assert detect_format(
        content=b'<?xml version="1.0"?>\n<catalog><item>x</item></catalog>'
    ) == "xml"


def test_mbox_requires_full_envelope():
    """ADVICE r2: prose starting with 'From ' is NOT mbox; only the full
    'From <addr> <Weekday> <Mon> <day> <hh:mm>' envelope is
    (email.ts:509-511 isMboxSeparator)."""
    assert detect_format(content=b"From the archives\nA story about...") == "text"
    assert detect_format(
        content=b"From alice@example.com Mon Jan 15 09:30:00 2024\n"
        b"Subject: Hi\n\nBody\n"
    ) == "mbox"
    # case-insensitive weekday, like the reference's /iu flag
    assert detect_format(
        content=b"From bob@x.org tue Feb 2 10:00:00 2023\nSubject: Y\n\nZ\n"
    ) == "mbox"


def test_cfb_container_classification():
    """CFB payloads route by stream names: MAPI streams → msg; legacy
    Word/PowerPoint/Excel detected (doc/ppt/xls) and routed to an
    unsupported-format row, never a mojibake text parse (VERDICT r2 #9)."""
    from test_loaders import make_cfb, _utf16

    msg = make_cfb(
        {
            "__substg1.0_0037001F": _utf16("S"),
            "__substg1.0_1000001F": _utf16("B"),
        }
    )
    assert detect_format(content=msg) == "msg"
    doc = make_cfb({"WordDocument": b"\x00" * 16, "1Table": b"\x00" * 16})
    assert detect_format(content=doc) == "doc"
    ppt = make_cfb({"PowerPoint Document": b"\x00" * 16})
    assert detect_format(content=ppt) == "ppt"
    xls = make_cfb({"Workbook": b"\x00" * 16})
    assert detect_format(content=xls) == "xls"
    assert detect_format(content=make_cfb({"Mystery": b"\x00" * 8})) == "cfb"
    # extension/mime fallback for legacy types
    assert detect_format(url="https://x.example/a.msg") == "msg"
    assert detect_format(mime="application/msword") == "doc"


def test_msg_ingestion_end_to_end():
    """ADVICE r2: .msg payloads reach the MSG email loader from the generic
    ingestion entry point (payload_to_text), not the text fallback."""
    from test_loaders import make_cfb, _utf16
    from kiwi_spark.functions.loaders import payload_to_text

    msg = make_cfb(
        {
            "__substg1.0_0037001F": _utf16("MSG Subject"),
            "__substg1.0_0C1A001F": _utf16("Sender"),
            "__substg1.0_1000001F": _utf16("MSG body"),
        }
    )
    text, ft = payload_to_text(msg)
    assert ft == "msg"
    assert "# Email Message" in text and "MSG body" in text
    # legacy binary doc: detected, empty text (UNSUPPORTED routing)
    doc = make_cfb({"WordDocument": b"\x00" * 16})
    text, ft = payload_to_text(doc)
    assert ft == "doc" and text == ""
