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
