"""TIFF decoder (first IFD), pure Python + numpy.

Completes the feasible image-container set for the multimodal feature
operator (reference: loader/image.ts; PIL absent in this environment).
Scope: both byte orders, 8-bit samples, strip organization, grayscale
(black- and white-is-zero) / RGB / palette photometrics, compression
none (1), LZW (5, TIFF variant: MSB-first bit packing with early code
width change, optional horizontal-differencing predictor) and PackBits
(32773). Tiled, planar, 16-bit and JPEG-in-TIFF files return None.
"""

from __future__ import annotations

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, bo: str):
    """First IFD → {tag: [values]} or None."""
    offset = int.from_bytes(data[4:8], bo)
    if offset + 2 > len(data):
        return None
    count = int.from_bytes(data[offset : offset + 2], bo)
    entries: dict[int, list[int]] = {}
    for i in range(count):
        base = offset + 2 + 12 * i
        if base + 12 > len(data):
            return None
        tag = int.from_bytes(data[base : base + 2], bo)
        vtype = int.from_bytes(data[base + 2 : base + 4], bo)
        n = int.from_bytes(data[base + 4 : base + 8], bo)
        size = _TYPE_SIZES.get(vtype)
        if size is None:
            continue
        total = size * n
        if total <= 4:
            raw = data[base + 8 : base + 8 + total]
        else:
            voff = int.from_bytes(data[base + 8 : base + 12], bo)
            raw = data[voff : voff + total]
        if len(raw) < total:
            return None
        if vtype in (1, 2):
            values = list(raw)
        elif vtype == 3:
            values = [int.from_bytes(raw[j : j + 2], bo) for j in range(0, total, 2)]
        elif vtype == 4:
            values = [int.from_bytes(raw[j : j + 4], bo) for j in range(0, total, 4)]
        else:  # rational — numerators only (unused tags here)
            values = [int.from_bytes(raw[j : j + 4], bo) for j in range(0, total, 8)]
        entries[tag] = values
    return entries


def _unpackbits(data: bytes, expected: int) -> bytes | None:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        control = data[i]
        i += 1
        if control < 128:  # literal run of control+1 bytes
            out += data[i : i + control + 1]
            i += control + 1
        elif control > 128:  # repeat next byte 257-control times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - control)
            i += 1
        # 128: no-op
    return bytes(out[:expected]) if len(out) >= expected else None


def _tiff_lzw(data: bytes, expected: int) -> bytes | None:
    """TIFF-variant LZW: MSB-first bit packing, CLEAR=256, EOI=257, and the
    'early change' — code width bumps one code before the table fills."""
    CLEAR, EOI = 256, 257
    base_size = 9
    table: list[bytes] = []

    def reset():
        nonlocal table, code_size
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_size = base_size

    code_size = base_size
    reset()
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_index = bitpos >> 3
        chunk = int.from_bytes(
            data[byte_index : byte_index + 4].ljust(4, b"\x00"), "big"
        )
        code = (chunk >> (32 - (bitpos & 7) - code_size)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # early change: width grows when ONE code remains before overflow
        if len(table) + 1 >= (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:expected]) if len(out) >= expected else None


def decode_tiff(payload: bytes):
    """TIFF bytes → (width, height, luma ndarray) or None."""
    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        return None
    ifd = _read_ifd(payload, bo)
    if not ifd:
        return None

    def first(tag: int, default: int | None = None):
        values = ifd.get(tag)
        return values[0] if values else default

    width = first(_TAG_WIDTH)
    height = first(_TAG_HEIGHT)
    samples = first(_TAG_SAMPLES, 1)
    compression = first(_TAG_COMPRESSION, 1)
    photometric = first(_TAG_PHOTOMETRIC)
    predictor = first(_TAG_PREDICTOR, 1)
    planar = first(_TAG_PLANAR, 1)
    bits = ifd.get(_TAG_BITS, [8])
    offsets = ifd.get(_TAG_STRIP_OFFSETS)
    counts = ifd.get(_TAG_STRIP_COUNTS)
    rows_per_strip = first(_TAG_ROWS_PER_STRIP, height or 0)
    if (
        not width or not height or not offsets or not counts
        or photometric is None or planar != 1
        or any(b != 8 for b in bits) or samples not in (1, 3)
        or compression not in (1, 5, 32773)
        or len(offsets) != len(counts)
    ):
        return None
    row_bytes = width * samples
    decoded = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, remaining_rows)
        expected = strip_rows * row_bytes
        raw = payload[off : off + cnt]
        if len(raw) < cnt:
            return None
        if compression == 1:
            strip = raw[:expected]
            if len(strip) < expected:
                return None
        elif compression == 32773:
            strip = _unpackbits(raw, expected)
        else:
            strip = _tiff_lzw(raw, expected)
        if strip is None:
            return None
        decoded += strip
        remaining_rows -= strip_rows
    if len(decoded) < height * row_bytes:
        return None
    px = np.frombuffer(
        bytes(decoded), dtype=np.uint8, count=height * row_bytes
    ).reshape(height, width, samples)
    if predictor == 2:  # horizontal differencing: cumulative sum per row
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    px = px.astype(np.float64)
    if photometric == 2 and samples == 3:  # RGB
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    elif photometric == 3 and samples == 1:  # palette (16-bit CCs, R|G|B)
        cmap = ifd.get(_TAG_COLORMAP)
        if not cmap or len(cmap) < 3 * 256:
            return None
        table = np.asarray(cmap[: 3 * 256], dtype=np.float64).reshape(3, 256) / 257.0
        idx = px[..., 0].astype(np.int64)
        luma = (
            0.299 * table[0][idx] + 0.587 * table[1][idx] + 0.114 * table[2][idx]
        )
    elif photometric in (0, 1) and samples == 1:  # grayscale
        luma = px[..., 0]
        if photometric == 0:  # white is zero
            luma = 255.0 - luma
    else:
        return None
    return width, height, luma
