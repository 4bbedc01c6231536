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
AC_COUNTS = bytes([0, 0, 0, 5] + [0] * 12)
AC_SYMBOLS = bytes([0x00, 0x01, 0x11, 0xF0, 0x10])
DC_CODE = {s: (s, 4) for s in range(8)}          # symbol → (code, length)
AC_CODE = {0x00: (0, 4), 0x01: (1, 4), 0x11: (2, 4), 0xF0: (3, 4), 0x10: (4, 4)}


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


def test_jpeg_rejects_lossless_and_garbage():
    assert decode_jpeg(b"\x89PNG\r\n\x1a\n") is None
    # SOF3 (lossless) frame → unsupported
    w = _BitWriter()
    _dc_bits(w, 0)
    w.write(*AC_CODE[0x00])
    good = make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3")
    assert decode_jpeg(lossless) is None


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


# --- progressive (SOF2): spectral selection + successive approximation ------


def make_progressive_jpeg(width: int, height: int, scans: list[dict]) -> bytes:
    """scans: [{'ss','se','ah','al','bits': _BitWriter, 'rst': bytes|None}]
    over a single grayscale component."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([1, 1, 0x11, 0])
    out += _seg(0xC2, sof)  # SOF2 progressive
    out += _seg(0xC4, bytes([0x00]) + DC_COUNTS + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
    for scan in scans:
        sos = bytes([1, 1, 0x00])
        sos += bytes([scan["ss"], scan["se"], (scan["ah"] << 4) | scan["al"]])
        out += _seg(0xDA, sos)
        out += scan["bits"].tobytes()
    return out + b"\xff\xd9"


def test_jpeg_progressive_dc_successive_approximation():
    # scan 1: DC first at Al=1 → coded value 16>>1 = 8; scan 2: refine bit 0
    s1 = _BitWriter()
    _dc_bits(s1, 8)
    s2 = _BitWriter()
    s2.write(0, 1)
    payload = make_progressive_jpeg(8, 8, [
        {"ss": 0, "se": 0, "ah": 0, "al": 1, "bits": s1},
        {"ss": 0, "se": 0, "ah": 1, "al": 0, "bits": s2},
    ])
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (8, 8)
    assert np.allclose(luma, 130.0)  # DC (8<<1)|0 = 16 → 16/8 + 128


def test_jpeg_progressive_spectral_selection_matches_baseline():
    # DC scan then AC band scan: final coefficients equal the baseline
    # AC test (DC=16, +1 at zigzag 1) → identical pixels
    s1 = _BitWriter()
    _dc_bits(s1, 16)
    s2 = _BitWriter()
    s2.write(*AC_CODE[0x01])
    s2.write(1, 1)
    s2.write(*AC_CODE[0x00])  # EOB
    payload = make_progressive_jpeg(8, 8, [
        {"ss": 0, "se": 0, "ah": 0, "al": 0, "bits": s1},
        {"ss": 1, "se": 63, "ah": 0, "al": 0, "bits": s2},
    ])
    _, _, luma = decode_jpeg(payload)

    wb = _BitWriter()
    _dc_bits(wb, 16)
    wb.write(*AC_CODE[0x01])
    wb.write(1, 1)
    wb.write(*AC_CODE[0x00])
    _, _, baseline = decode_jpeg(
        make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], wb.tobytes())
    )
    assert np.allclose(luma, baseline, atol=1e-12)


def test_jpeg_progressive_ac_refinement():
    # AC first at Al=1 codes 3>>1 = 1 at zigzag 1 (stored as 2);
    # AC refine at Al=0: correction-only block → EOB then 1 bit → 3
    s1 = _BitWriter()
    _dc_bits(s1, 16)
    s2 = _BitWriter()
    s2.write(*AC_CODE[0x01])
    s2.write(1, 1)
    s2.write(*AC_CODE[0x00])
    s3 = _BitWriter()
    s3.write(*AC_CODE[0x00])  # EOB run of 1: corrections only
    s3.write(1, 1)            # correction bit for the nonzero coeff
    payload = make_progressive_jpeg(8, 8, [
        {"ss": 0, "se": 0, "ah": 0, "al": 0, "bits": s1},
        {"ss": 1, "se": 63, "ah": 0, "al": 1, "bits": s2},
        {"ss": 1, "se": 63, "ah": 1, "al": 0, "bits": s3},
    ])
    _, _, luma = decode_jpeg(payload)

    import math

    def c(u):
        return math.sqrt(0.125) if u == 0 else 0.5

    expected = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            value = 0.0
            for (u, v, coeff) in [(0, 0, 16.0), (0, 1, 3.0)]:
                value += (
                    c(u) * c(v) * coeff
                    * math.cos((2 * y + 1) * u * math.pi / 16)
                    * math.cos((2 * x + 1) * v * math.pi / 16)
                )
            expected[y, x] = value + 128.0
    assert np.allclose(luma, expected, atol=1e-9)


def test_jpeg_progressive_ac_refine_new_coefficient():
    # refinement scans can also INSERT a new ±1<<Al coefficient: block has
    # +2 at zigzag 1 (from the first scan), the refine scan adds -1 at
    # zigzag 2 then corrects zigzag 1 upward: final = 3 at z1, -1 at z2
    s1 = _BitWriter()
    _dc_bits(s1, 16)
    s2 = _BitWriter()
    s2.write(*AC_CODE[0x01])
    s2.write(1, 1)            # +1<<1 = 2 at zigzag 1
    s2.write(*AC_CODE[0x00])
    s3 = _BitWriter()
    s3.write(*AC_CODE[0x01])  # (run 0, size 1): new coefficient
    s3.write(0, 1)            # sign bit 0 → -1<<Al = -1
    s3.write(1, 1)            # correction bit for existing z1 coeff (2→3)
    # the new coefficient lands at the first zero-history position (z2)
    s3.write(*AC_CODE[0x00])  # EOB for the rest
    payload = make_progressive_jpeg(8, 8, [
        {"ss": 0, "se": 0, "ah": 0, "al": 0, "bits": s1},
        {"ss": 1, "se": 63, "ah": 0, "al": 1, "bits": s2},
        {"ss": 1, "se": 63, "ah": 1, "al": 0, "bits": s3},
    ])
    _, _, luma = decode_jpeg(payload)

    import math

    def c(u):
        return math.sqrt(0.125) if u == 0 else 0.5

    # zigzag 1 = (0,1); zigzag 2 = (1,0)
    expected = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            value = 0.0
            for (u, v, coeff) in [(0, 0, 16.0), (0, 1, 3.0), (1, 0, -1.0)]:
                value += (
                    c(u) * c(v) * coeff
                    * math.cos((2 * y + 1) * u * math.pi / 16)
                    * math.cos((2 * x + 1) * v * math.pi / 16)
                )
            expected[y, x] = value + 128.0
    assert np.allclose(luma, expected, atol=1e-9)


def test_jpeg_progressive_eob_run_spans_blocks():
    # 16×8: AC band scan codes block 1's coefficient then an EOB run of 2
    # (r=1, 0 extra bits) covering blocks 1..2 — block 2's band stays zero
    s1 = _BitWriter()
    _dc_bits(s1, 16)
    _dc_bits(s1, 8)   # DC 24
    s2 = _BitWriter()
    s2.write(*AC_CODE[0x01])
    s2.write(1, 1)
    s2.write(*AC_CODE[0x10])  # EOB run: r=1 → eobrun = 2-1 after this block
    s2.write(0, 1)            # 1 extra bit (value 0): eobrun = (1<<1)-1+0 = 1
    payload = make_progressive_jpeg(16, 8, [
        {"ss": 0, "se": 0, "ah": 0, "al": 0, "bits": s1},
        {"ss": 1, "se": 63, "ah": 0, "al": 0, "bits": s2},
    ])
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (16, 8)
    assert np.allclose(luma[:, 8:], 131.0)  # block 2: DC-only 24/8+128
    # block 1 has DC 16 + AC(+1 at z1): row means differ from uniform
    assert not np.allclose(luma[:, :8], 130.0)


# --- ADVICE r3 regressions ---------------------------------------------------


def test_bitreader_buffer_stays_bounded():
    """ADVICE r3: _BitReader.bitbuf must not grow with bytes consumed —
    an unbounded Python int made decoding quadratic in scan size (a
    restart-free few-hundred-KB scan effectively hung the executor)."""
    from kiwi_spark.functions.jpeg_decode import _BitReader

    data = bytes((i * 37 + 11) % 255 for i in range(20_000))  # no 0xFF bytes
    reader = _BitReader(data, 0)
    for i in range(8 * len(data)):
        reader.read_bit()
        if i % 4096 == 0:
            assert reader.bitbuf.bit_length() <= 32
    assert reader.bitbuf.bit_length() <= 32


def make_jpeg_multiscan(width: int, height: int, components: list[dict],
                        scans: list[tuple[int, bytes]]) -> bytes:
    """Baseline JPEG with one SOS PER COMPONENT (non-interleaved scans).
    scans: [(component list index, entropy bytes)]."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(components)])
    for c in components:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + DC_COUNTS + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
    for index, bits in scans:
        out += _seg(0xDA, bytes([1, components[index]["id"], 0x00, 0, 63, 0]))
        out += bits
    return out + b"\xff\xd9"


def test_jpeg_baseline_separate_component_scans_use_raster_grid():
    """ADVICE r3: T.81 §A.2 — ANY single-component scan is non-interleaved
    (the component's real bw×bh grid in raster order), including baseline.
    32×16 with Y 2×2 makes raster order differ from MCU order, so routing
    the scan through the interleaved branch would garble the block grid."""
    y = _BitWriter()
    for _ in range(8):            # Y DCs 8,16,...,64 in RASTER order
        _dc_bits(y, 8)
        y.write(*AC_CODE[0x00])
    cb = _BitWriter()
    for _ in range(2):            # Cb: bw=2, bh=1
        _dc_bits(cb, 0)
        cb.write(*AC_CODE[0x00])
    cr = _BitWriter()
    for _ in range(2):
        _dc_bits(cr, 0)
        cr.write(*AC_CODE[0x00])
    comps = [
        {"id": 1, "h": 2, "v": 2},
        {"id": 2, "h": 1, "v": 1},
        {"id": 3, "h": 1, "v": 1},
    ]
    payload = make_jpeg_multiscan(
        32, 16, comps, [(0, y.tobytes()), (1, cb.tobytes()), (2, cr.tobytes())]
    )
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (32, 16)
    for by in range(2):
        for bx in range(4):
            dc = 8 * (by * 4 + bx + 1)
            assert np.allclose(
                luma[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], dc / 8 + 128.0
            ), (by, bx)


def test_jpeg_single_component_frame_with_sampling_factors():
    """Single-component frames are always non-interleaved even when the
    declared sampling factors are >1 (T.81: MCU = one block over bw×bh)."""
    w = _BitWriter()
    for _ in range(8):            # bw=4, bh=2 raster blocks, DCs 8..64
        _dc_bits(w, 8)
        w.write(*AC_CODE[0x00])
    payload = make_jpeg_multiscan(
        32, 16, [{"id": 1, "h": 2, "v": 2}], [(0, w.tobytes())]
    )
    width, height, luma = decode_jpeg(payload)
    assert (width, height) == (32, 16)
    for by in range(2):
        for bx in range(4):
            dc = 8 * (by * 4 + bx + 1)
            assert np.allclose(
                luma[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], dc / 8 + 128.0
            ), (by, bx)


def test_jpeg_arithmetic_coding_routes_to_none():
    """VERDICT r3 #8: arithmetic-coded JPEGs (SOF9/SOF10) are documented-
    unsupported — decode_jpeg must return None, not garble the scan."""
    w = _BitWriter()
    _dc_bits(w, 16)
    w.write(*AC_CODE[0x00])
    good = make_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1}], w.tobytes())
    assert decode_jpeg(good) is not None
    for marker in (b"\xff\xc9", b"\xff\xca", b"\xff\xcb"):
        assert decode_jpeg(good.replace(b"\xff\xc0", marker)) is None, marker
