"""Input format detection (SURVEY §2.1 S3).

Port of the sniffing logic in packages/graph/src/loader/factory.ts:169
(`detectGraphLoaderFileFormat`, html prefix check :487-488) + the
extension/mime table of file-type.ts:32-168 (subset relevant to a crawl
corpus). Priority: content sniff → declared mime → extension.
"""

from __future__ import annotations

import json
import re

_MIME_MAP = {
    "text/html": "html",
    "application/xhtml+xml": "html",
    "text/markdown": "markdown",
    "text/plain": "text",
    "application/pdf": "pdf",
    "text/csv": "csv",
    "application/json": "json",
    "application/x-ndjson": "json",
    "text/yaml": "yaml",
    "application/yaml": "yaml",
    "application/toml": "toml",
    "message/rfc822": "email",
    "application/mbox": "mbox",
    "text/calendar": "calendar",
    "text/vcard": "vcard",
    "application/xml": "xml",
    "text/xml": "xml",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "docx",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "xlsx",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "pptx",
    "application/vnd.oasis.opendocument.text": "odt",
    "application/vnd.oasis.opendocument.presentation": "odp",
    "image/png": "image",
    "image/jpeg": "image",
    "image/gif": "image",
    "image/webp": "image",
    "application/vnd.ms-outlook": "msg",
    "application/msword": "doc",
    "application/vnd.ms-powerpoint": "ppt",
    "application/vnd.ms-excel": "xls",
}

_EXT_MAP = {
    "html": "html", "htm": "html", "xhtml": "html",
    "md": "markdown", "markdown": "markdown",
    "txt": "text", "text": "text",
    "pdf": "pdf", "csv": "csv", "tsv": "csv",
    "json": "json", "jsonl": "json", "ndjson": "json",
    "yaml": "yaml", "yml": "yaml", "toml": "toml",
    "eml": "email", "mbox": "mbox", "ics": "calendar", "vcf": "vcard",
    "xml": "xml",
    "docx": "docx", "xlsx": "xlsx", "pptx": "pptx",
    "odt": "odt", "odp": "odp",
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "webp": "image", "tif": "image", "tiff": "image",
    "msg": "msg", "doc": "doc", "ppt": "ppt", "xls": "xls",
}

_MAGIC = [
    (b"%PDF-", "pdf"),
    (b"\x89PNG\r\n\x1a\n", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF87a", "image"),
    (b"GIF89a", "image"),
    (b"RIFF", "image"),  # webp container
    (b"II*\x00", "image"),  # TIFF little-endian
    (b"MM\x00*", "image"),  # TIFF big-endian
]


# email.ts:509-511 — the full mbox "From <addr> <Weekday> <Mon> <day> <hh:mm>"
# envelope; prose that merely starts with "From " must NOT classify as mbox.
_MBOX_SEPARATOR = re.compile(
    r"^From \S+ (?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)\s+\S+\s+\d{1,2}\s+\d{2}:\d{2}",
    re.IGNORECASE,
)

# OLE/CFB compound-file signature (factory.ts:499 matchesAt d0 cf 11 e0)
_CFB_SIGNATURE = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _classify_cfb(content: bytes) -> str:
    """Distinguish the CFB container families by their root stream names:
    Outlook MSG carries MAPI ``__substg1.0_``/``__properties_version1.0``
    streams; legacy Word/PowerPoint/Excel carry ``WordDocument`` /
    ``PowerPoint Document`` / ``Workbook`` (doc.test.ts / ppt.test.ts
    fixture layout). Unknown CFB payloads return 'cfb' and are routed to a
    documented unsupported-format error row, never a text misparse."""
    try:
        from .loaders import cfb_streams

        names = set(cfb_streams(content).keys())
    except Exception:
        return "cfb"
    def has(fragment: str) -> bool:
        return any(fragment in n for n in names)
    if has("__substg1.0_") or has("__properties_version1.0"):
        return "msg"
    if has("WordDocument"):
        return "doc"
    if has("PowerPoint Document"):
        return "ppt"
    if has("Workbook") or has("Book"):
        return "xls"
    return "cfb"


def _xml_declared_root_is_html(head: bytes) -> bool:
    """XHTML pages open with an XML declaration before ``<!DOCTYPE html>`` /
    ``<html``; the reference never routes those to the XML loader (its
    sniffTextFileFormat, factory.ts:484-518, has no ``<?xml`` sniff at all).
    Scan past the declaration + comments/doctype for an html root."""
    text = head[:4096].decode("utf-8", errors="replace")
    pos = text.find("?>")
    rest = text[pos + 2 :] if pos >= 0 else text
    while True:
        rest = rest.lstrip()
        if rest.lower().startswith("<!--"):
            end = rest.find("-->")
            if end < 0:
                return False
            rest = rest[end + 3 :]
            continue
        break
    lower = rest.lower()
    return lower.startswith("<!doctype html") or lower.startswith("<html")


# factory.ts:132-133
_EMAIL_HEADER_NAMES = {
    "bcc", "cc", "date", "from", "message-id", "reply-to", "subject", "to",
}
_EMAIL_ROUTE_HEADER_NAMES = {"bcc", "cc", "from", "message-id", "reply-to", "to"}


def _has_email_header_block(head: bytes) -> bool:
    """factory.ts:520-546 — ≥2 known RFC-822 headers incl. a routing header
    before the first blank line."""
    import re

    headers: set[str] = set()
    has_route = False
    try:
        prefix = head[:4096].decode("utf-8", errors="replace")
    except Exception:
        return False
    for line in re.split(r"\r?\n", prefix):
        if line.strip() == "":
            break
        if line[:1] in (" ", "\t"):
            continue
        match = re.match(r"^([A-Za-z][A-Za-z0-9-]*):", line)
        if not match:
            break
        header = match.group(1).lower()
        if header in _EMAIL_HEADER_NAMES:
            headers.add(header)
            has_route = has_route or header in _EMAIL_ROUTE_HEADER_NAMES
    return len(headers) >= 2 and has_route


def detect_format(
    content: bytes | None = None,
    mime: str | None = None,
    url: str | None = None,
) -> str:
    """Return the loader file-type for a document; default 'text'."""
    if content:
        head = content[:4096].lstrip()
        for magic, fmt in _MAGIC:
            if content.startswith(magic):
                return fmt
        lower = head[:64].lower()
        # factory.ts:487-488 — html prefix sniff
        if lower.startswith(b"<!doctype html") or lower.startswith(b"<html"):
            return "html"
        if lower.startswith(b"{") or lower.startswith(b"["):
            try:
                json.loads(head.decode("utf-8", errors="strict"))
                return "json"
            except (ValueError, UnicodeDecodeError):
                pass
        if lower.startswith(b"begin:vcalendar"):
            return "calendar"
        if lower.startswith(b"begin:vcard"):
            return "vcard"
        if content.startswith(b"From "):
            first_line = (
                content[:1024]
                .split(b"\n", 1)[0]
                .decode("utf-8", errors="replace")
                .rstrip()
            )
            if _MBOX_SEPARATOR.match(first_line):
                return "mbox"
        if content.startswith(_CFB_SIGNATURE):
            return _classify_cfb(content)
        if content.startswith(b"PK\x03\x04"):
            # OOXML container — inspect the zip directory for the part root
            import io
            import zipfile

            try:
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    names = zf.namelist()
            except Exception:
                names = []
            if "mimetype" in names:
                try:
                    with zipfile.ZipFile(io.BytesIO(content)) as zf:
                        odf_mime = zf.read("mimetype").decode("ascii", "ignore")
                except Exception:
                    odf_mime = ""
                if odf_mime == "application/vnd.oasis.opendocument.text":
                    return "odt"
                if odf_mime == "application/vnd.oasis.opendocument.presentation":
                    return "odp"
            if any(n.startswith("word/") for n in names):
                return "docx"
            if any(n.startswith("xl/") for n in names):
                return "xlsx"
            if any(n.startswith("ppt/") for n in names):
                return "pptx"
        if lower.startswith(b"<?xml"):
            # XHTML (xml declaration + html root) must stay on the
            # byte-exact HTML path; everything else is xml
            if _xml_declared_root_is_html(head):
                return "html"
            return "xml"
        if _has_email_header_block(head):
            return "email"
    if mime:
        base = mime.split(";")[0].strip().lower()
        if base in _MIME_MAP:
            return _MIME_MAP[base]
    if url:
        path = url.split("?")[0].split("#")[0]
        if "." in path.rsplit("/", 1)[-1]:
            ext = path.rsplit(".", 1)[-1].lower()
            if ext in _EXT_MAP:
                return _EXT_MAP[ext]
    return "text"
