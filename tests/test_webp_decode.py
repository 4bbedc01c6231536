"""VP8L (lossless WebP) decoder — functions/webp_decode.py.

Fixtures are hand-packed LSB-first bitstreams built from the public
RFC 9649 layout, with hand-computed expected pixels: simple prefix
codes, canonical (code-length-coded) prefix codes, LZ77 with the 2D
distance map, the color cache, and all four transforms. No encoder of
ours participates — every expected value is derived on paper from the
spec.
"""

from __future__ import annotations

import struct

import numpy as np

from kiwi_spark.functions.webp_decode import _DISTANCE_MAP, decode_webp


class _W:
    """LSB-first bit packer (the VP8L order)."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def code(self, bits: str) -> None:
        """Prefix-code bits in decode order (first bit read = first char)."""
        for ch in bits:
            self.bits.append(int(ch))

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            out[i >> 3] |= bit << (i & 7)
        return bytes(out)


def riff(vp8l_payload: bytes, fourcc: bytes = b"VP8L") -> bytes:
    chunk = fourcc + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def header(w: _W, width: int, height: int) -> None:
    w.w(0x2F, 8)
    w.w(width - 1, 14)
    w.w(height - 1, 14)
    w.w(0, 1)  # alpha hint
    w.w(0, 3)  # version


def simple_code(w: _W, symbols: list[int], first_8bit: bool = True) -> None:
    """Symbols must be ≤255 (simple codes cap at 8-bit symbols)."""
    w.w(1, 1)
    w.w(len(symbols) - 1, 1)
    w.w(1 if first_8bit else 0, 1)
    w.w(symbols[0], 8 if first_8bit else 1)
    if len(symbols) == 2:
        w.w(symbols[1], 8)


def canonical_two(w: _W, sym_a: int, sym_b: int) -> None:
    """Canonical code with exactly two length-1 symbols (a < b) — needed
    when a symbol exceeds 255 (length/cache codes). Uses a 4-entry
    code-length code {0:'00', 1:'01', 17:'10', 18:'11'}."""
    assert sym_a < sym_b
    w.w(0, 1)          # not simple
    w.w(0, 4)          # num_clc = 4 → order [17, 18, 0, 1]
    for length in (2, 2, 2, 2):
        w.w(length, 3)

    entries: list[tuple[str, int, int]] = []  # (clc bits, extra, extra bits)

    def zeros(n: int) -> None:
        while n > 0:
            if n >= 11:
                k = min(n, 138)
                entries.append(("11", k - 11, 7))
                n -= k
            elif n >= 3:
                k = min(n, 10)
                entries.append(("10", k - 3, 3))
                n -= k
            else:
                entries.append(("00", 0, 0))
                n -= 1

    zeros(sym_a)
    entries.append(("01", 0, 0))
    zeros(sym_b - sym_a - 1)
    entries.append(("01", 0, 0))

    # limited symbol count = number of code-length reads
    w.w(1, 1)
    w.w(1, 3)                    # length_nbits = 2 + 2*1 = 4
    w.w(len(entries) - 2, 4)     # max_symbol = 2 + this
    for bits, extra, nbits in entries:
        w.code(bits)
        if nbits:
            w.w(extra, nbits)


def single_codes(w: _W, *values: int) -> None:
    for value in values:
        simple_code(w, [value])


def _luma(a, r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b


def test_distance_map_head_matches_spec():
    assert _DISTANCE_MAP[:8] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    ]
    assert len(_DISTANCE_MAP) == 120
    assert len(set(_DISTANCE_MAP)) == 120


def test_vp8l_literals_simple_codes():
    w = _W()
    header(w, 2, 1)
    w.w(0, 1)  # no transforms
    w.w(0, 1)  # no color cache
    w.w(0, 1)  # no meta prefix
    simple_code(w, [10, 20])       # green
    single_codes(w, 30, 40, 255, 0)  # red, blue, alpha, distance
    w.code("0")                    # pixel 0 → green 10
    w.code("1")                    # pixel 1 → green 20
    result = decode_webp(riff(w.tobytes()))
    assert result is not None
    width, height, luma = result
    assert (width, height) == (2, 1)
    assert abs(luma[0][0] - _luma(255, 30, 10, 40)) < 1e-9
    assert abs(luma[0][1] - _luma(255, 30, 20, 40)) < 1e-9


def test_vp8l_subtract_green_transform():
    w = _W()
    header(w, 1, 1)
    w.w(1, 1)      # transform present
    w.w(2, 2)      # subtract-green
    w.w(0, 1)      # no more transforms
    w.w(0, 1)      # no cache
    w.w(0, 1)      # no meta
    single_codes(w, 100, 30, 40, 255, 0)  # green, red, blue, alpha, dist
    result = decode_webp(riff(w.tobytes()))
    _, _, luma = result
    # r = (30+100) & 255 = 130, b = (40+100) & 255 = 140
    assert abs(luma[0][0] - _luma(255, 130, 100, 140)) < 1e-9


def test_vp8l_lz77_copy_with_distance_map():
    w = _W()
    header(w, 4, 1)
    w.w(0, 1)
    w.w(0, 1)
    w.w(0, 1)
    canonical_two(w, 10, 258)      # green: literal 10 OR length-code 2
    single_codes(w, 30, 40, 255)   # red, blue, alpha
    single_codes(w, 1)             # distance code 1 → raw 2 → map (1,0) → 1
    w.code("0")                    # literal green 10
    w.code("1")                    # length code 258 → length 3, copy dist 1
    result = decode_webp(riff(w.tobytes()))
    width, _, luma = result
    assert width == 4
    assert np.allclose(luma[0], _luma(255, 30, 10, 40))


def test_vp8l_color_cache_hit():
    a, r, g, b = 255, 30, 10, 40
    argb = (a << 24) | (r << 16) | (g << 8) | b
    index = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - 4)
    w = _W()
    header(w, 2, 2)
    w.w(0, 1)      # no transforms
    w.w(1, 1)      # color cache
    w.w(4, 4)      # cache_bits = 4
    w.w(0, 1)      # no meta
    canonical_two(w, g, 280 + index)   # green literal OR cache hit
    single_codes(w, r, b, a, 0)
    w.code("0")    # literal
    w.code("1")    # cache hits ×3
    w.code("1")
    w.code("1")
    result = decode_webp(riff(w.tobytes()))
    width, height, luma = result
    assert (width, height) == (2, 2)
    assert np.allclose(luma, _luma(a, r, g, b))


def test_vp8l_predictor_transform_left_mode():
    w = _W()
    header(w, 4, 1)
    w.w(1, 1)      # transform
    w.w(0, 2)      # predictor
    w.w(0, 3)      # size_bits = 2 → one 4×4 block
    # 1×1 mode subimage: green = mode 1 (Left)
    w.w(0, 1)      # subimage: no cache
    single_codes(w, 1, 0, 0, 0, 0)
    w.w(0, 1)      # end of transforms
    w.w(0, 1)      # main: no cache
    w.w(0, 1)      # no meta
    simple_code(w, [20, 0])        # green residuals
    simple_code(w, [10, 0])        # red residuals
    simple_code(w, [30, 0])        # blue residuals
    single_codes(w, 0)             # alpha residual 0 everywhere
    single_codes(w, 0)             # distance (unused)
    w.code("000")                  # p0: green 20, red 10, blue 30
    for _ in range(3):
        w.code("111")              # p1..p3: residual 0 in g/r/b → copy left
    result = decode_webp(riff(w.tobytes()))
    width, _, luma = result
    assert width == 4
    # p0: pred = (255,0,0,0) → pixel (255, 10, 20, 30); rest copy left
    assert np.allclose(luma[0], _luma(255, 10, 20, 30))


def test_vp8l_palette_with_bundling():
    # 8×1, two palette colors → 1-bit indices bundled 8-per-green-byte
    w = _W()
    header(w, 8, 1)
    w.w(1, 1)      # transform
    w.w(3, 2)      # color indexing
    w.w(1, 8)      # n_colors - 1 = 1
    # palette image (2×1), delta-coded entries:
    #   e0 = (255,200,10,5); e1 = e0 + (0,55,30,100) = (255,255,40,105)
    w.w(0, 1)      # palette subimage: no cache
    simple_code(w, [10, 30])       # green
    simple_code(w, [200, 55])      # red
    simple_code(w, [5, 100])       # blue
    simple_code(w, [255, 0])       # alpha
    single_codes(w, 0)             # distance
    w.code("0")
    w.code("0")
    w.code("0")
    w.code("0")    # entry 0
    w.code("1")
    w.code("1")
    w.code("1")
    w.code("1")    # entry 1 (deltas)
    w.w(0, 1)      # end of transforms
    # main image is 1×1 packed: green byte = 0b10110010 (LSB = x0)
    w.w(0, 1)      # no cache
    w.w(0, 1)      # no meta
    single_codes(w, 0b10110010, 0, 0, 0, 0)
    result = decode_webp(riff(w.tobytes()))
    width, height, luma = result
    assert (width, height) == (8, 1)
    pal = [(255, 200, 10, 5), (255, 255, 40, 105)]
    expected = [
        _luma(*pal[(0b10110010 >> x) & 1]) for x in range(8)
    ]
    assert np.allclose(luma[0], expected)


def test_vp8x_wrapper_and_rejections():
    w = _W()
    header(w, 1, 1)
    w.w(0, 1)
    w.w(0, 1)
    w.w(0, 1)
    single_codes(w, 7, 8, 9, 255, 0)
    payload = w.tobytes()
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        vp8l += b"\x00"
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l)) + b"WEBP" + vp8x + vp8l
    result = decode_webp(wrapped)
    assert result is not None and result[0] == 1

    assert decode_webp(riff(b"\x00\x01\x02", fourcc=b"VP8 ")) is None  # lossy
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_webp(b"not a webp") is None
    assert decode_webp(riff(b"\xff\xff")) is None  # bad signature


def test_spark_image_operator_decodes_webp(spark):
    from kiwi_spark.operators.multimodal import ASSET_SCHEMA, decode_image_features

    w = _W()
    header(w, 2, 1)
    w.w(0, 1)
    w.w(0, 1)
    w.w(0, 1)
    simple_code(w, [10, 20])
    single_codes(w, 30, 40, 255, 0)
    w.code("0")
    w.code("1")
    payload = riff(w.tobytes())
    assets = spark.createDataFrame(
        [("w1", "u1", "image", bytearray(payload), ("image/webp", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    rows = decode_image_features(assets).collect()
    assert len(rows) == 1
    assert rows[0]["width"] == 2 and rows[0]["height"] == 1
    expected = (_luma(255, 30, 10, 40) + _luma(255, 30, 20, 40)) / 2 / 255.0
    assert abs(rows[0]["mean_luma"] - expected) < 1e-9


def test_vp8l_all_predictor_modes_against_independent_reimpl():
    """56×3 image, predictor blocks of 4px: block k uses mode k (0..13).
    Row 0 takes varied literal values (spec override: pred = Left), rows
    1-2 carry zero residuals so every pixel must equal the predictor
    output exactly — compared against a predictor reimplementation
    written independently in this test."""
    width, height = 56, 3
    rng_bits = [(i * 7 + 3) % 2 for i in range(width)]  # deterministic

    w = _W()
    header(w, width, height)
    w.w(1, 1)      # transform
    w.w(0, 2)      # predictor
    w.w(0, 3)      # size_bits = 2 → 14 blocks of 4px, one block row
    # mode subimage 14×1: mode k at block k (green channel)
    w.w(0, 1)      # no cache
    canonical = list(range(14))
    # canonical code over greens 0..13, all length 4 via code-length code
    w.w(0, 1)      # not simple
    w.w(0, 4)      # num_clc = 4 → order [17, 18, 0, 1]... need length '4'
    # lengths for clc symbols [17, 18, 0, 4]: but order is fixed
    # [17,18,0,1,2,3,4,...]; we need entries up to symbol 4 → num_clc ≥ 7
    w.bits = w.bits[:-4]           # rewind the num_clc nibble
    w.w(3, 4)                      # num_clc = 7 → [17, 18, 0, 1, 2, 3, 4]
    for length in (0, 0, 0, 0, 0, 0, 1):   # only symbol '4' has a code
        w.w(length, 3)
    w.w(0, 1)      # no max_symbol limit
    for _ in range(14):
        w.code("")                 # single-symbol clc: '4' costs 0 bits
    # all 14 symbols get length 4 → canonical codes 0000..1101 by symbol
    single_codes(w, 0, 0, 0, 0)    # r, b, a, dist for the mode image
    for mode in canonical:
        w.code(format(mode, "04b"))
    w.w(0, 1)      # end of transforms

    # main image
    w.w(0, 1)      # no cache
    w.w(0, 1)      # no meta
    simple_code(w, [0, 200])       # green residuals
    simple_code(w, [0, 13])        # red residuals
    simple_code(w, [0, 97])        # blue residuals
    single_codes(w, 0)             # alpha residuals
    single_codes(w, 0)             # distance
    for x in range(width):         # row 0: varied literals
        bit = rng_bits[x]
        w.code(str(bit) * 3)       # same bit for g, r, b
    for _ in range(2 * width):     # rows 1-2: zero residuals
        w.code("000")

    result = decode_webp(riff(w.tobytes()))
    assert result is not None
    _, _, luma = result

    # --- independent reimplementation of the 14 predictors (spec §5.1) ---
    def avg2(a, b):
        return [(x + y) // 2 for x, y in zip(a, b)]

    def clamp(v):
        return max(0, min(255, v))

    px = [[0, 0, 0, 0]] * (width * height)
    for i in range(width * height):
        x, y = i % width, i // width
        if y == 0:
            if x == 0:
                pred = [255, 0, 0, 0]
            else:
                pred = px[i - 1]
            bit = rng_bits[x]
            px[i] = [
                (pred[0] + 0) & 255,
                (pred[1] + (13 if bit else 0)) & 255,
                (pred[2] + (200 if bit else 0)) & 255,
                (pred[3] + (97 if bit else 0)) & 255,
            ]
            continue
        if x == 0:
            px[i] = list(px[i - width])
            continue
        mode = x // 4
        L, T, TL = px[i - 1], px[i - width], px[i - width - 1]
        TR = px[i - width + 1]
        if mode == 0:
            pred = [255, 0, 0, 0]
        elif mode == 1:
            pred = L
        elif mode == 2:
            pred = T
        elif mode == 3:
            pred = TR
        elif mode == 4:
            pred = TL
        elif mode == 5:
            pred = avg2(avg2(L, TR), T)
        elif mode == 6:
            pred = avg2(L, TL)
        elif mode == 7:
            pred = avg2(L, T)
        elif mode == 8:
            pred = avg2(TL, T)
        elif mode == 9:
            pred = avg2(T, TR)
        elif mode == 10:
            pred = avg2(avg2(L, TL), avg2(T, TR))
        elif mode == 11:
            p_l = sum(abs(T[c] - TL[c]) for c in range(4))
            p_t = sum(abs(L[c] - TL[c]) for c in range(4))
            pred = L if p_l < p_t else T
        elif mode == 12:
            pred = [clamp(L[c] + T[c] - TL[c]) for c in range(4)]
        else:
            pred = []
            for c in range(4):
                a = (L[c] + T[c]) // 2
                d = a - TL[c]
                # C-style truncation toward zero, as in libwebp
                pred.append(clamp(a + (abs(d) // 2) * (1 if d >= 0 else -1)))
        px[i] = [p & 255 for p in pred]

    expected = np.array([
        [0.299 * p[1] + 0.587 * p[2] + 0.114 * p[3]
         for p in px[y * width : (y + 1) * width]]
        for y in range(height)
    ])
    assert np.allclose(luma, expected)


def test_vp8l_cross_color_transform():
    # one block: g2r=10, g2b=246 (int8 −10), r2b=4 over pixel
    # (a255, r20, g100, b200): red → 20 + (10*100>>5) = 20 + 31 = 51;
    # blue → 200 + (−10*100>>5) + (4*51>>5) = 200 − 32 + 6 = 174
    # (red_to_blue applies to the ALREADY-transformed red, per spec).
    w = _W()
    header(w, 1, 1)
    w.w(1, 1)      # transform
    w.w(1, 2)      # cross-color
    w.w(0, 3)      # size_bits = 2
    w.w(0, 1)      # cte subimage: no cache
    # RFC 9649 ColorTransformElement channel layout: BLUE carries
    # green_to_red, GREEN carries green_to_blue, RED carries red_to_blue.
    # All three multipliers are distinct so a channel swap cannot pass.
    single_codes(w, 246, 4, 10, 255, 0)   # green=g2b, red=r2b, blue=g2r
    w.w(0, 1)      # end transforms
    w.w(0, 1)      # no cache
    w.w(0, 1)      # no meta
    single_codes(w, 100, 20, 200, 255, 0)
    result = decode_webp(riff(w.tobytes()))
    _, _, luma = result
    assert abs(luma[0][0] - _luma(255, 51, 100, 174)) < 1e-9


def test_vp8l_oversized_canvas_routes_to_none():
    """Bomb guard: a tiny payload declaring a 16384×16384 canvas (LZ77
    would expand it executor-side) returns None instead of decoding."""
    w = _W()
    header(w, 16384, 16384)
    w.w(0, 1)
    w.w(0, 1)
    w.w(0, 1)
    single_codes(w, 0, 0, 0, 255, 0)
    assert decode_webp(riff(w.tobytes())) is None
