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
