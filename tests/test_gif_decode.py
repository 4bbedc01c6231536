"""GIF decoder (functions/gif_decode.py).

Fixtures are byte-built in the test. Two LZW encodings are used so the
decoder's table handling is exercised independently of any encoder of
ours: (a) the clear-before-every-pixel stream (no table growth — each
code is a literal), and (b) a hand-packed stream hitting the KwKwK
(code == table size) case, both with hand-computed expected pixels.
"""

from __future__ import annotations

import numpy as np

from kiwi_spark.functions.gif_decode import decode_gif


def _pack_codes(codes: list[int], code_size: int) -> bytes:
    """LSB-first GIF bit packing at a fixed code width (streams below are
    short enough that the width never grows)."""
    value = 0
    nbits = 0
    out = bytearray()
    for code in codes:
        value |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(value & 0xFF)
            value >>= 8
            nbits -= 8
    if nbits:
        out.append(value & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        piece = data[i : i + 255]
        out.append(len(piece))
        out += piece
    out.append(0)
    return bytes(out)


def make_gif(width: int, height: int, palette: list[tuple[int, int, int]],
             pixel_rows: list[list[int]], interlace: bool = False,
             kwkwk: bool = False) -> bytes:
    """Palette must have power-of-two size ≥4. Pixel indices are encoded
    with a CLEAR before every literal code unless kwkwk (then the caller
    passes exactly the [1,1,1] pattern; see test)."""
    n = len(palette)
    size_bits = max(2, (n - 1).bit_length())
    assert n == 1 << size_bits
    header = b"GIF89a"
    header += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    header += bytes([0x80 | (size_bits - 1), 0, 0])
    header += b"".join(bytes(c) for c in palette)
    desc = b"\x2c" + b"\x00\x00\x00\x00"
    desc += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    desc += bytes([0x40 if interlace else 0x00])
    min_code = size_bits
    clear, end = 1 << min_code, (1 << min_code) + 1
    flat = [p for row in pixel_rows for p in row]
    if kwkwk:
        codes = [clear, 1, end + 1, end]  # 1 then KwKwK(→1,1) = pixels 1,1,1
    else:
        codes = []
        for p in flat:
            codes += [clear, p]
        codes.append(end)
    packed = _pack_codes(codes, min_code + 1)
    body = bytes([min_code]) + _subblocks(packed)
    return header + desc + body + b"\x3b"


PAL4 = [(255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def _luma(rgb):
    return 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]


def test_gif_basic_palette_pixels():
    rows = [[0, 1, 2, 3], [3, 2, 1, 0]]
    payload = make_gif(4, 2, PAL4, rows)
    width, height, luma = decode_gif(payload)
    assert (width, height) == (4, 2)
    for y in range(2):
        for x in range(4):
            assert abs(luma[y][x] - _luma(PAL4[rows[y][x]])) < 1e-9


def test_gif_lzw_kwkwk_case():
    payload = make_gif(3, 1, PAL4, [[1, 1, 1]], kwkwk=True)
    width, height, luma = decode_gif(payload)
    assert (width, height) == (3, 1)
    assert np.allclose(luma[0], _luma(PAL4[1]))


def test_gif_interlaced_rows_reordered():
    # 8 rows, each a uniform distinct index (palette of 8)
    pal8 = PAL4 + [(10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)]
    logical = [[i] * 4 for i in range(8)]
    # interlace storage order for 8 rows: 0, 4, 2, 6, 1, 3, 5, 7
    stored = [logical[i] for i in (0, 4, 2, 6, 1, 3, 5, 7)]
    payload = make_gif(4, 8, pal8, stored, interlace=True)
    width, height, luma = decode_gif(payload)
    assert (width, height) == (4, 8)
    for y in range(8):
        assert np.allclose(luma[y], _luma(pal8[y])), y


def test_gif_skips_extensions_and_rejects_garbage():
    rows = [[1, 2], [2, 1]]
    payload = make_gif(2, 2, PAL4, rows)
    # splice a graphic-control extension between header+GCT and the image
    gct_end = 13 + 3 * len(PAL4)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = payload[:gct_end] + gce + payload[gct_end:]
    width, height, luma = decode_gif(spliced)
    assert (width, height) == (2, 2)
    assert abs(luma[0][0] - _luma(PAL4[1])) < 1e-9
    assert decode_gif(b"NOTGIF87a") is None
    assert decode_gif(b"GIF89a\x00\x00") is None


def test_spark_image_operator_decodes_gif(spark):
    from kiwi_spark.operators.multimodal import ASSET_SCHEMA, decode_image_features

    rows = [[0, 1], [2, 3]]
    payload = make_gif(2, 2, PAL4, rows)
    assets = spark.createDataFrame(
        [("g1", "u1", "image", bytearray(payload), ("image/gif", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    out = decode_image_features(assets).collect()
    assert len(out) == 1
    assert out[0]["width"] == 2 and out[0]["height"] == 2
    expected_mean = sum(_luma(PAL4[i]) for r in rows for i in r) / 4 / 255.0
    assert abs(out[0]["mean_luma"] - expected_mean) < 1e-9


def test_gif_frame_rect_past_screen_is_skipped_not_error():
    """ADVICE r3: a malformed image descriptor placing the frame past the
    logical screen (top ≥ screen_h) must not raise (one bad GIF would fail
    the whole mapInPandas stage) — compositing is skipped instead."""
    payload = bytearray(make_gif(2, 2, PAL4, [[0, 1], [2, 3]]))
    desc = 13 + 3 * len(PAL4)            # image descriptor offset
    assert payload[desc] == 0x2C
    payload[desc + 3 : desc + 5] = (3).to_bytes(2, "little")  # top = 3
    result = decode_gif(bytes(payload))
    assert result is not None
    width, height, luma = result
    assert (width, height) == (2, 2)
    assert np.allclose(luma, 0.0)        # nothing composited
