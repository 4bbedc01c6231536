"""GIF decoder (first frame), pure Python + numpy.

Covers the remaining common web image container for the multimodal
feature operator (reference: loader/image.ts; PIL absent in this
environment). GIF87a/GIF89a, global/local color tables, full LZW
decompression (variable code width, clear/EOI, KwKwK case), interlaced
and non-interlaced first frame → BT.601 luma at frame size. Extensions
(GCE/comment/application) are skipped; animation beyond frame 1 is out
of scope for feature extraction.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes | None:
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_index = bitpos >> 3
        chunk = int.from_bytes(data[byte_index : byte_index + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:expected]) if len(out) >= expected else None


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """GIF bytes → (width, height, luma ndarray of the first frame) or
    None. Frame is composited onto the logical screen at its offset;
    uncovered screen area is left black (background handling without a
    GCE is renderer-defined; features only need the frame content)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    screen_w = int.from_bytes(payload[6:8], "little")
    screen_h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            return None
        gct = gct.reshape(n, 3)
        pos += 3 * n
    if screen_w <= 0 or screen_h <= 0:
        return None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            return None  # no image block seen
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            return None
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        fw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if len(table) < 3 * n:
                return None
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None or fw <= 0 or fh <= 0:
            return None
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            size = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + size])
            pos += 1 + size
        pixels = _lzw_decode(b"".join(chunks), min_code_size, fw * fh)
        if pixels is None:
            return None
        idx = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
        if int(idx.max(initial=0)) >= len(table):
            return None
        rows = idx.reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: reorder rows into logical order
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                count = len(range(start, fh, step))
                ordered[start::step] = rows[src : src + count]
                src += count
            rows = ordered
        rgb = table[rows].astype(np.float64)
        frame_luma = (
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        )
        luma = np.zeros((screen_h, screen_w), dtype=np.float64)
        y1 = min(screen_h, top + fh)
        x1 = min(screen_w, left + fw)
        # a malformed descriptor may place the frame past the logical screen
        # (top ≥ screen_h / left ≥ screen_w → negative slice extents); skip
        # compositing rather than raising inside the mapInPandas UDF
        if top < y1 and left < x1:
            luma[top:y1, left:x1] = frame_luma[: y1 - top, : x1 - left]
        return screen_w, screen_h, luma
    return None
