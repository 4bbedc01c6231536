"""Legacy binary Office text extraction: .doc (Word 97-2003), .xls
(BIFF8), .ppt (PowerPoint 97-2003).

Parity-or-BETTER vs the reference: its factory routes ``.doc`` to the
OOXML-only DOCXLoader (apps/worker/loaders/factory.ts:56,238-244), which
throws on CFB containers — legacy binaries produce error rows there.
Here they extract real text. All three parsers are scoped from-spec
implementations over the public [MS-DOC], [MS-XLS] and [MS-PPT] format
documentation, reading streams via the existing CFB reader
(loaders.cfb_streams):

* **doc** — FIB → Clx piece table in the 0Table/1Table stream → text
  pieces (cp1252-compressed or UTF-16LE) over the main document range
  (ccpText), with Word control-character mapping (para/cell/line marks,
  field characters, soft hyphens).
* **xls** — Workbook globals SST (+ LABELSST cell records across sheet
  substreams), NUMBER/RK numeric cells; rendered sheet-by-sheet as
  tab-joined rows in (row, col) order. SSTs spanning CONTINUE records
  are handled at any split point, including mid-string splits where the
  continuation re-sends a grbit byte and may switch encoding
  ([MS-XLS] 2.5.2); malformed splits bail to what was cleanly parsed.
* **ppt** — record walk of the ``PowerPoint Document`` stream:
  container records (recVer 0xF) recursed, TextCharsAtom (UTF-16LE) /
  TextBytesAtom (cp1252) / CString payloads emitted in document order.

Unsupported constructs degrade to partial text or '', never raise.
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------------------
# Word 97-2003 (.doc) — [MS-DOC] FIB + piece table
# --------------------------------------------------------------------------

_DOC_CHAR_MAP = {
    0x0D: "\n",   # paragraph mark
    0x07: "\t",   # cell mark / row mark
    0x0B: "\n",   # hard line break
    0x0C: "\n",   # page/section break
    0x0E: "\n",   # column break
    0x1E: "-",    # non-breaking hyphen
    0x1F: "",     # soft hyphen
    0xA0: " ",    # NBSP -> plain space
}
_DOC_DROP = frozenset([0x00, 0x01, 0x02, 0x05, 0x08, 0x13, 0x14, 0x15, 0x28])


def _doc_clean(text: str) -> str:
    out: list[str] = []
    for ch in text:
        code = ord(ch)
        if code in _DOC_DROP:
            continue
        out.append(_DOC_CHAR_MAP.get(code, ch) if code in _DOC_CHAR_MAP else ch)
    return "".join(out)


def doc_to_text(streams: dict[str, bytes]) -> str:
    word = streams.get("WordDocument", b"")
    if len(word) < 1058 or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        return ""
    flags = struct.unpack_from("<H", word, 10)[0]
    table = streams.get("1Table" if flags & 0x0200 else "0Table", b"")

    # FIB variable part: csw words, cslw longs, cbRgFcLcb fc/lcb pairs
    pos = 32
    csw = struct.unpack_from("<H", word, pos)[0]
    rgw = pos + 2
    pos = rgw + csw * 2
    cslw = struct.unpack_from("<H", word, pos)[0]
    rglw = pos + 2
    pos = rglw + cslw * 4
    cb_pairs = struct.unpack_from("<H", word, pos)[0]
    blob = pos + 2
    if cslw < 4 or cb_pairs < 34:
        return ""
    ccp_text = struct.unpack_from("<I", word, rglw + 12)[0]  # FibRgLw97.ccpText
    fc_clx = struct.unpack_from("<I", word, blob + 33 * 8)[0]
    lcb_clx = struct.unpack_from("<I", word, blob + 33 * 8 + 4)[0]
    clx = table[fc_clx : fc_clx + lcb_clx]
    if not clx:
        return ""

    # Clx: Prc blocks (0x01) then Pcdt (0x02) holding the PlcPcd
    i = 0
    plcpcd = b""
    while i < len(clx):
        kind = clx[i]
        if kind == 0x01:
            if i + 3 > len(clx):
                return ""
            cb = struct.unpack_from("<H", clx, i + 1)[0]
            i += 3 + cb
        elif kind == 0x02:
            if i + 5 > len(clx):
                return ""
            lcb = struct.unpack_from("<I", clx, i + 1)[0]
            plcpcd = clx[i + 5 : i + 5 + lcb]
            break
        else:
            return ""
    if len(plcpcd) < 4 + 12:
        return ""
    n = (len(plcpcd) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plcpcd, 0)
    parts: list[str] = []
    for k in range(n):
        fc_raw = struct.unpack_from("<I", plcpcd, 4 * (n + 1) + 8 * k + 2)[0]
        nchars = cps[k + 1] - cps[k]
        if nchars <= 0:
            continue
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            raw = word[fc // 2 : fc // 2 + nchars]
            parts.append(raw.decode("cp1252", errors="replace"))
        else:
            raw = word[fc : fc + 2 * nchars]
            parts.append(raw.decode("utf-16-le", errors="replace"))
    text = "".join(parts)[:ccp_text]
    return _doc_clean(text).strip()


# --------------------------------------------------------------------------
# Excel 97-2003 (.xls) — [MS-XLS] BIFF8 Workbook stream
# --------------------------------------------------------------------------

class _SSTReader:
    """Cursor over the SST record payload plus its CONTINUE payloads.

    [MS-XLS] 2.5.2: an XLUnicodeRichExtendedString may be split across a
    CONTINUE boundary.  When the split falls inside the CHARACTER data,
    the continuation re-sends a 1-byte option-flags (grbit) prefix whose
    fHighByte bit governs the encoding of the remaining characters (it
    may differ from the first fragment's).  Splits inside fixed header
    fields, rgRun, or ExtRst carry no such prefix.  Concatenating the
    payloads verbatim therefore splices grbit bytes into string data and
    shifts every subsequent cch field — the bug this class fixes.
    """

    def __init__(self, blocks: list[bytes]) -> None:
        self.blocks = blocks
        self.bi = 0
        self.off = 0

    def read(self, n: int) -> bytes:
        """Read n bytes of non-character data (headers/runs/ext);
        block boundaries are transparent — no grbit prefix."""
        out = bytearray()
        while n > 0:
            while self.off >= len(self.blocks[self.bi]):
                if self.bi + 1 >= len(self.blocks):
                    raise EOFError("SST truncated")
                self.bi += 1
                self.off = 0
            block = self.blocks[self.bi]
            take = min(n, len(block) - self.off)
            out += block[self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        """Read cch characters; crossing into a CONTINUE block mid-string
        consumes that block's leading grbit and switches encoding."""
        parts: list[str] = []
        while cch > 0:
            if self.off >= len(self.blocks[self.bi]):
                if self.bi + 1 >= len(self.blocks):
                    raise EOFError("SST string truncated")
                self.bi += 1
                self.off = 0
                if not self.blocks[self.bi]:
                    continue
                high = bool(self.blocks[self.bi][0] & 0x01)
                self.off = 1
                continue
            block = self.blocks[self.bi]
            avail = len(block) - self.off
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:
                # a split inside a UTF-16 code unit is malformed
                raise EOFError("SST split mid-character")
            raw = block[self.off : self.off + take * width]
            parts.append(
                raw.decode("utf-16-le" if high else "cp1252", errors="replace")
            )
            self.off += take * width
            cch -= take
        return "".join(parts)


def _parse_sst(blocks: list[bytes]) -> list[str]:
    """XLUnicodeRichExtendedString array over SST + CONTINUE payloads.
    Malformed input bails, returning only the cleanly parsed strings."""
    strings: list[str] = []
    if not blocks or len(blocks[0]) < 8:
        return strings
    (total,) = struct.unpack_from("<I", blocks[0], 4)
    rd = _SSTReader(blocks)
    rd.off = 8
    try:
        for _ in range(total):
            cch, flags = struct.unpack("<HB", rd.read(3))
            c_run = 0
            cb_ext = 0
            if flags & 0x08:  # rich
                (c_run,) = struct.unpack("<H", rd.read(2))
            if flags & 0x04:  # extended
                (cb_ext,) = struct.unpack("<I", rd.read(4))
            strings.append(rd.read_chars(cch, bool(flags & 0x01)))
            rd.read(4 * c_run + cb_ext)
    except (struct.error, EOFError):
        pass
    return strings


def _rk_value(rk: int) -> float:
    value: float
    if rk & 0x02:  # integer
        value = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0] >> 2)
    else:
        value = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return value / 100.0 if rk & 0x01 else value


def _fmt_num(value: float) -> str:
    return str(int(value)) if float(value).is_integer() else repr(value)


def xls_to_text(streams: dict[str, bytes]) -> str:
    book = streams.get("Workbook") or streams.get("Book") or b""
    if len(book) < 4:
        return ""
    sst: list[str] = []
    sheets: list[str] = []
    # cells[sheet_index][(row, col)] = text
    cells: list[dict[tuple[int, int], str]] = []
    sheet_index = -1
    pos = 0
    pending_sst: list[bytes] | None = None
    while pos + 4 <= len(book):
        rtype, rlen = struct.unpack_from("<HH", book, pos)
        payload = book[pos + 4 : pos + 4 + rlen]
        pos += 4 + rlen
        if rtype == 0x00FC:  # SST (globals)
            pending_sst = [payload]
            continue
        if rtype == 0x003C and pending_sst is not None:  # CONTINUE
            # kept as a separate block: _SSTReader knows a continuation
            # that starts mid-string carries a leading grbit byte
            pending_sst.append(payload)
            continue
        if pending_sst is not None:
            sst = _parse_sst(pending_sst)
            pending_sst = None
        if rtype == 0x0085 and len(payload) >= 8:  # BOUNDSHEET8
            cch = payload[6]
            high = payload[7] & 0x01
            raw = payload[8 : 8 + (2 * cch if high else cch)]
            sheets.append(
                raw.decode("utf-16-le" if high else "cp1252", errors="replace")
            )
        elif rtype == 0x0809:  # BOF — a new substream (globals first)
            sheet_index += 1
            cells.append({})
        elif rtype == 0x00FD and len(payload) >= 10 and cells:  # LABELSST
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", payload, 0)
            if 0 <= isst < len(sst):
                cells[-1][(row, col)] = sst[isst]
        elif rtype == 0x0203 and len(payload) >= 14 and cells:  # NUMBER
            row, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            (value,) = struct.unpack_from("<d", payload, 6)
            cells[-1][(row, col)] = _fmt_num(value)
        elif rtype == 0x027E and len(payload) >= 10 and cells:  # RK
            row, col, _ixfe, rk = struct.unpack_from("<HHHI", payload, 0)
            cells[-1][(row, col)] = _fmt_num(_rk_value(rk))
    if pending_sst is not None:
        sst = _parse_sst(pending_sst)

    out: list[str] = []
    # substream 0 is workbook globals; sheets follow in BOUNDSHEET order
    for idx, sheet_cells in enumerate(cells[1:]):
        if not sheet_cells:
            continue
        name = sheets[idx] if idx < len(sheets) else f"Sheet{idx + 1}"
        out.append(f"# {name}")
        rows: dict[int, dict[int, str]] = {}
        for (row, col), value in sheet_cells.items():
            rows.setdefault(row, {})[col] = value
        for row in sorted(rows):
            by_col = rows[row]
            out.append("\t".join(by_col[c] for c in sorted(by_col)))
    return "\n".join(out).strip()


# --------------------------------------------------------------------------
# PowerPoint 97-2003 (.ppt) — [MS-PPT] record tree
# --------------------------------------------------------------------------

_PPT_TEXTCHARS = 0x0FA0
_PPT_TEXTBYTES = 0x0FA8
_PPT_CSTRING = 0x0FBA


def _walk_ppt(data: bytes, out: list[str], depth: int = 0) -> None:
    if depth > 16:
        return
    pos = 0
    while pos + 8 <= len(data):
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
        payload = data[pos + 8 : pos + 8 + rlen]
        pos += 8 + rlen
        if (ver_inst & 0x000F) == 0x000F:  # container
            _walk_ppt(payload, out, depth + 1)
        elif rtype in (_PPT_TEXTCHARS, _PPT_CSTRING):
            text = payload.decode("utf-16-le", errors="replace")
            if text.strip():
                out.append(text.replace("\r", "\n").strip())
        elif rtype == _PPT_TEXTBYTES:
            text = payload.decode("cp1252", errors="replace")
            if text.strip():
                out.append(text.replace("\r", "\n").strip())


def ppt_to_text(streams: dict[str, bytes]) -> str:
    doc = streams.get("PowerPoint Document", b"")
    if not doc:
        return ""
    out: list[str] = []
    _walk_ppt(doc, out)
    return "\n\n".join(out).strip()


def legacy_office_to_text(data: bytes, file_type: str) -> str:
    """Entry point for payload_to_text: dispatch on the sniffed CFB type."""
    from .loaders import cfb_streams

    streams = cfb_streams(data)
    if not streams:
        return ""
    try:
        if file_type == "doc":
            return doc_to_text(streams)
        if file_type == "xls":
            return xls_to_text(streams)
        if file_type == "ppt":
            return ppt_to_text(streams)
    except (struct.error, IndexError, ValueError):
        return ""
    return ""
