"""TIFF decoder (functions/tiff_decode.py). Fixtures are byte-built IFDs
with hand-computed expected pixels; the TIFF-variant LZW stream is packed
MSB-first in-test with the clear-before-every-code encoding (no table
growth) so decoder table handling is independent of any encoder of ours.
"""

from __future__ import annotations

import struct

import numpy as np

from kiwi_spark.functions.tiff_decode import decode_tiff


def _entry(bo, tag, vtype, values, data_area, data_offset):
    sizes = {1: 1, 3: 2, 4: 4}
    size = sizes[vtype]
    total = size * len(values)
    packed = b"".join(v.to_bytes(size, bo) for v in values)
    e = tag.to_bytes(2, bo) + vtype.to_bytes(2, bo) + len(values).to_bytes(4, bo)
    if total <= 4:
        e += packed.ljust(4, b"\x00")
    else:
        e += (data_offset + len(data_area)).to_bytes(4, bo)
        data_area += packed
    return e, data_area


def make_tiff(width, height, strips, *, bo="little", samples=1,
              photometric=1, compression=1, predictor=None, colormap=None,
              rows_per_strip=None, bits=8, tiled=False):
    """strips: list of raw strip bytes (already compressed per
    `compression`). Layout: header(8) + IFD + out-of-line values + strips.
    ``tiled=True`` stores the data under Tile* tags (322/323/324/325)
    instead of strip tags — the decoder's documented-unsupported layout."""
    header = (b"II*\x00" if bo == "little" else b"MM\x00*")
    header += (8).to_bytes(4, bo)  # first IFD at offset 8
    tags = [
        (256, 3, [width]), (257, 3, [height]), (258, 3, [bits] * samples),
        (259, 3, [compression]), (262, 3, [photometric]),
        (277, 3, [samples]),
    ]
    if tiled:
        tags += [(322, 3, [width]), (323, 3, [height])]
    else:
        tags.append((278, 3, [rows_per_strip or height]))
    if predictor:
        tags.append((317, 3, [predictor]))
    if colormap is not None:
        tags.append((320, 3, colormap))
    n = len(tags) + 2  # + strip offsets/counts
    extra_offset = 8 + 2 + 12 * n + 4
    off_tag, cnt_tag = (324, 325) if tiled else (273, 279)

    def build(strip_offsets):
        extra = b""
        items = []
        for tag, vtype, values in sorted(
            tags
            + [(off_tag, 4, strip_offsets), (cnt_tag, 4, [len(s) for s in strips])]
        ):
            e, extra = _entry(bo, tag, vtype, values, extra, extra_offset)
            items.append(e)
        ifd = len(items).to_bytes(2, bo) + b"".join(items) + b"\x00" * 4
        return ifd, extra

    # first pass with dummy offsets to size the out-of-line area
    _ifd, extra1 = build([0] * len(strips))
    data_start = extra_offset + len(extra1)
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    ifd, extra = build(offsets)
    assert len(extra) == len(extra1)
    return header + ifd + extra + b"".join(strips)


def _luma(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b


def test_tiff_uncompressed_gray_both_endians():
    rows = bytes([0, 64, 128, 255, 10, 20, 30, 40])
    for bo in ("little", "big"):
        payload = make_tiff(4, 2, [rows], bo=bo, photometric=1)
        w, h, luma = decode_tiff(payload)
        assert (w, h) == (4, 2)
        assert luma[0].tolist() == [0.0, 64.0, 128.0, 255.0]
        assert luma[1].tolist() == [10.0, 20.0, 30.0, 40.0]
    # white-is-zero inverts
    w, h, luma = decode_tiff(make_tiff(4, 2, [rows], photometric=0))
    assert luma[0][3] == 0.0 and luma[0][0] == 255.0


def test_tiff_rgb_packbits_multi_strip():
    # 2×2 RGB, one strip per row, PackBits-compressed
    row1 = bytes([255, 0, 0, 0, 255, 0])
    row2 = bytes([0, 0, 255, 100, 100, 100])

    def packbits_literal(data):
        return bytes([len(data) - 1]) + data

    payload = make_tiff(
        2, 2, [packbits_literal(row1), packbits_literal(row2)],
        samples=3, photometric=2, compression=32773, rows_per_strip=1,
    )
    w, h, luma = decode_tiff(payload)
    assert (w, h) == (2, 2)
    assert abs(luma[0][0] - _luma(255, 0, 0)) < 1e-9
    assert abs(luma[0][1] - _luma(0, 255, 0)) < 1e-9
    assert abs(luma[1][0] - _luma(0, 0, 255)) < 1e-9
    assert abs(luma[1][1] - 100.0) < 1e-9
    # PackBits repeat-run path
    rep = bytes([(257 - 4) & 0xFF, 77])  # repeat 77 four times
    payload = make_tiff(4, 1, [rep], samples=1, photometric=1,
                        compression=32773)
    w, h, luma = decode_tiff(payload)
    assert luma[0].tolist() == [77.0] * 4


def _tiff_lzw_pack(codes):
    """MSB-first 9-bit packing (streams below keep the table small so the
    width never grows)."""
    value = 0
    nbits = 0
    out = bytearray()
    for code in codes:
        value = (value << 9) | code
        nbits += 9
        while nbits >= 8:
            out.append((value >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((value << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_with_predictor():
    CLEAR, EOI = 256, 257
    # pixel row 10, 13, 13, 20 under predictor 2 → deltas 10, 3, 0, 7
    deltas = [10, 3, 0, 7]
    codes = [CLEAR]
    for d in deltas:
        codes += [d, CLEAR]
    codes.append(EOI)
    payload = make_tiff(4, 1, [_tiff_lzw_pack(codes)], compression=5,
                        predictor=2)
    w, h, luma = decode_tiff(payload)
    assert (w, h) == (4, 1)
    assert luma[0].tolist() == [10.0, 13.0, 13.0, 20.0]


def test_tiff_lzw_string_table_growth():
    CLEAR, EOI = 256, 257
    # without interleaved clears the table grows: codes [CLEAR, 5, 258, EOI]
    # → 258 is the KwKwK case: output 5,5,5
    payload = make_tiff(3, 1, [_tiff_lzw_pack([CLEAR, 5, 258, EOI])],
                        compression=5)
    w, h, luma = decode_tiff(payload)
    assert luma[0].tolist() == [5.0, 5.0, 5.0]


def test_tiff_palette():
    cmap = [0] * 768
    # entry 1: pure red; entry 2: pure green (16-bit color components)
    cmap[1] = 65535
    cmap[256 + 2] = 65535
    payload = make_tiff(2, 1, [bytes([1, 2])], photometric=3, colormap=cmap)
    w, h, luma = decode_tiff(payload)
    assert abs(luma[0][0] - 0.299 * 255) < 0.2
    assert abs(luma[0][1] - 0.587 * 255) < 0.2


def test_tiff_rejects_unsupported():
    assert decode_tiff(b"NOTTIFF!") is None
    # 16-bit samples unsupported
    payload = make_tiff(2, 1, [bytes(4)], photometric=1)
    broken = payload.replace(
        struct.pack("<HHI", 258, 3, 1) + struct.pack("<HH", 8, 0),
        struct.pack("<HHI", 258, 3, 1) + struct.pack("<HH", 16, 0),
    )
    assert decode_tiff(broken) is None


def test_format_detect_and_spark_operator_tiff(spark):
    from kiwi_spark.functions.format_detect import detect_format
    from kiwi_spark.operators.multimodal import ASSET_SCHEMA, decode_image_features

    rows = bytes([0, 100, 200, 255])
    payload = make_tiff(4, 1, [rows])
    assert detect_format(content=payload) == "image"
    assets = spark.createDataFrame(
        [("t1", "u1", "image", bytearray(payload), ("image/tiff", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    out = decode_image_features(assets).collect()
    assert len(out) == 1 and out[0]["width"] == 4 and out[0]["height"] == 1
    assert abs(out[0]["mean_luma"] - (0 + 100 + 200 + 255) / 4 / 255.0) < 1e-9


def test_tiff_16bit_samples_route_to_none():
    """VERDICT r3 #8: 16-bit-per-sample TIFFs are documented-unsupported —
    the decoder must return None (error-row routing), never misdecode the
    bytes as 8-bit."""
    rows = bytes(16)  # 4×2 gray at 16 bits/sample
    payload = make_tiff(4, 2, [rows], bits=16)
    assert decode_tiff(payload) is None


def test_tiff_tiled_layout_routes_to_none():
    """Tiled TIFFs (Tile* tags instead of strip tags) are documented-
    unsupported — None, not a crash or a garbled strip interpretation."""
    rows = bytes([0, 64, 128, 255, 10, 20, 30, 40])
    payload = make_tiff(4, 2, [rows], tiled=True)
    assert decode_tiff(payload) is None
    # the identical image as strips decodes fine (guard is tile-specific)
    w, h, _ = decode_tiff(make_tiff(4, 2, [rows]))
    assert (w, h) == (4, 2)
