"""Baseline JPEG decoder (functions/jpeg_decode.py).

Fixtures are encoded from the ITU-T.81 spec byte-by-byte in the test with
hand-chosen Huffman tables and all-ones quant tables, so the expected
pixel values are computable by hand: a DC-only block dequantizes to a
uniform plane of DC/8 + 128 (orthonormal IDCT of a constant), and DC
prediction chains across blocks. An AC case cross-checks the IDCT against
an independently-written cosine formula.
"""

from __future__ import annotations

import math

import numpy as np

from kiwi_spark.functions.jpeg_decode import decode_jpeg


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)  # pad with 1s
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


# canonical tables: DC symbols 0..7 as the 8 length-4 codes 0000..0111;
# AC symbols EOB, (0,1), (1,1), ZRL as the 4 length-4 codes 0000..0011
DC_COUNTS = bytes([0, 0, 0, 8] + [0] * 12)
DC_SYMBOLS = bytes(range(8))
AC_COUNTS = bytes([0, 0, 0, 4] + [0] * 12)
AC_SYMBOLS = bytes([0x00, 0x01, 0x11, 0xF0])
DC_CODE = {s: (s, 4) for s in range(8)}          # symbol → (code, length)
AC_CODE = {0x00: (0, 4), 0x01: (1, 4), 0x11: (2, 4), 0xF0: (3, 4)}


def _dc_bits(writer: _BitWriter, diff: int) -> None:
    size = 0 if diff == 0 else max(1, diff.bit_length() if diff > 0 else (-diff).bit_length())
    code, length = DC_CODE[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def make_jpeg(width: int, height: int, components: list[dict],
              scan_bits, restart_interval: int = 0) -> bytes:
    """components: [{'id','h','v'}]; scan_bits(writer) encodes the scan."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # Q0 = all ones
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(components)])
    for c in components:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + DC_COUNTS + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(components)])
    for c in components:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan_bits
    return out + b"\xff\xd9"


def test_jpeg_gray_dc_only_single_block():
    w = _BitWriter()
    _dc_bits(w, 16)                      # DC diff +16
    w.write(*AC_CODE[0x00])  # EOB
    payload = make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (8, 8)
    # DC-only block: uniform 16/8 + 128 = 130
    assert np.allclose(luma, 130.0)


def test_jpeg_gray_dc_prediction_two_blocks():
    w = _BitWriter()
    _dc_bits(w, 16)
    w.write(*AC_CODE[0x00])   # EOB block 1
    _dc_bits(w, 8)            # diff +8 → DC 24
    w.write(*AC_CODE[0x00])
    payload = make_jpeg(16, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (16, 8)
    assert np.allclose(luma[:, :8], 130.0)   # 16/8 + 128
    assert np.allclose(luma[:, 8:], 131.0)   # 24/8 + 128


def test_jpeg_ac_coefficient_against_independent_idct():
    w = _BitWriter()
    _dc_bits(w, 16)
    w.write(*AC_CODE[0x01])   # (run 0, size 1)
    w.write(1, 1)             # AC value +1 at zigzag index 1 → (row 0, col 1)
    w.write(*AC_CODE[0x00])   # EOB
    payload = make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    _, _, luma = decode_jpeg(payload)

    def c(u):
        return math.sqrt(0.125) if u == 0 else 0.5

    expected = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            value = 0.0
            for (u, v, coeff) in [(0, 0, 16.0), (0, 1, 1.0)]:  # (row, col)
                value += (
                    c(u) * c(v) * coeff
                    * math.cos((2 * y + 1) * u * math.pi / 16)
                    * math.cos((2 * x + 1) * v * math.pi / 16)
                )
            expected[y, x] = value + 128.0
    assert np.allclose(luma, expected, atol=1e-9)


def test_jpeg_ycbcr_420_interleaved_mcu():
    # 16×16, Y 2×2 + Cb/Cr 1×1: 4 Y blocks then 1 Cb + 1 Cr per MCU
    w = _BitWriter()
    for diff in (16, 8, -8, -16):  # Y DCs: 16, 24, 16, 0
        _dc_bits(w, diff)
        w.write(*AC_CODE[0x00])
    for _chroma in range(2):
        _dc_bits(w, 0)
        w.write(*AC_CODE[0x00])
    comps = [
        {"id": 1, "h": 2, "v": 2},
        {"id": 2, "h": 1, "v": 1},
        {"id": 3, "h": 1, "v": 1},
    ]
    payload = make_jpeg(16, 16, comps, w.tobytes())
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (16, 16)
    assert np.allclose(luma[:8, :8], 130.0)    # DC 16
    assert np.allclose(luma[:8, 8:], 131.0)    # DC 24
    assert np.allclose(luma[8:, :8], 130.0)    # DC 16
    assert np.allclose(luma[8:, 8:], 128.0)    # DC 0


def test_jpeg_restart_interval_resets_prediction():
    w1 = _BitWriter()
    _dc_bits(w1, 16)
    w1.write(*AC_CODE[0x00])
    w2 = _BitWriter()
    _dc_bits(w2, 8)           # after RST, predictor resets → DC 8, not 24
    w2.write(*AC_CODE[0x00])
    scan = w1.tobytes() + b"\xff\xd0" + w2.tobytes()
    payload = make_jpeg(16, 8, [{"id": 1, "h": 1, "v": 1}], scan,
                        restart_interval=1)
    _, _, luma = decode_jpeg(payload)
    assert np.allclose(luma[:, :8], 130.0)   # 16/8 + 128
    assert np.allclose(luma[:, 8:], 129.0)   # 8/8 + 128


def test_jpeg_rejects_progressive_and_garbage():
    assert decode_jpeg(b"\x89PNG\r\n\x1a\n") is None
    # SOF2 (progressive) frame → unsupported
    w = _BitWriter()
    _dc_bits(w, 0)
    w.write(*AC_CODE[0x00])
    good = make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_jpeg(progressive) is None


def test_spark_image_operator_decodes_jpeg(spark):
    from kiwi_spark.operators.multimodal import ASSET_SCHEMA, decode_image_features

    w = _BitWriter()
    _dc_bits(w, 16)
    w.write(*AC_CODE[0x00])
    payload = make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    assets = spark.createDataFrame(
        [("j1", "u1", "image", bytearray(payload), ("image/jpeg", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    rows = decode_image_features(assets).collect()  # fake=False: REAL decode
    assert len(rows) == 1
    assert rows[0]["width"] == 8 and rows[0]["height"] == 8
    assert abs(rows[0]["mean_luma"] - 130.0 / 255.0) < 1e-9
