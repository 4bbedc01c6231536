"""REAL (non-fake) multimodal decode paths: uncompressed 24-bit BMP and
PCM-16 WAV, with binary fixtures constructed byte-by-byte in the test (the
expected values are computed with plain Python arithmetic from the pixel /
sample values we wrote, independent of the decoder)."""

from __future__ import annotations

import struct

from kiwi_spark.operators.multimodal import (
    ahash64,
    decode_audio_features,
    decode_bmp,
    decode_image_features,
    decode_wav,
)


def make_bmp(pixels_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (bottom-up rows, 4-byte pad).

    ``pixels_rgb[y][x]`` is (r, g, b) with y=0 the TOP row.
    """
    height = len(pixels_rgb)
    width = len(pixels_rgb[0])
    row_size = (width * 3 + 3) & ~3
    data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for r, g, b in pixels_rgb[y]:
            row += bytes([b, g, r])  # BGR on disk
        row += b"\x00" * (row_size - len(row))
        data += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return bytes(header + info + data)


def make_wav(samples: list[int], sample_rate: int = 8000,
             n_channels: int = 1) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


PIXELS = [
    [(255, 255, 255), (0, 0, 0), (255, 0, 0), (0, 255, 0)],
    [(0, 0, 255), (128, 128, 128), (255, 255, 0), (10, 20, 30)],
]


def _expected_luma(pixels) -> list[list[float]]:
    return [
        [0.299 * r + 0.587 * g + 0.114 * b for (r, g, b) in row]
        for row in pixels
    ]


def test_decode_bmp_exact():
    payload = make_bmp(PIXELS)
    width, height, luma = decode_bmp(payload)
    assert (width, height) == (4, 2)
    expected = _expected_luma(PIXELS)
    for y in range(2):
        for x in range(4):
            assert abs(luma[y][x] - expected[y][x]) < 1e-9


def test_ahash_properties():
    payload = make_bmp(PIXELS)
    _, _, luma = decode_bmp(payload)
    h1 = ahash64(luma)
    assert isinstance(h1, int)
    # identical image → identical hash; inverted image → different hash
    inverted = make_bmp(
        [[(255 - r, 255 - g, 255 - b) for (r, g, b) in row] for row in PIXELS]
    )
    _, _, luma2 = decode_bmp(inverted)
    assert ahash64(luma) == h1
    assert ahash64(luma2) != h1


def test_decode_bmp_rejects_non_bmp():
    assert decode_bmp(b"\x89PNG\r\n\x1a\n....") is None
    assert decode_bmp(b"BM") is None


def test_decode_wav_exact():
    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]
    payload = make_wav(samples, sample_rate=8000)
    sample_rate, n_channels, duration_ms, rms, peak = decode_wav(payload)
    assert (sample_rate, n_channels) == (8000, 1)
    assert duration_ms == len(samples) * 1000 // 8000
    floats = [s / 32768.0 for s in samples]
    expected_rms = (sum(f * f for f in floats) / len(floats)) ** 0.5
    assert abs(rms - expected_rms) < 1e-12
    assert abs(peak - 1.0) < 1e-12


def test_decode_wav_rejects_non_wav():
    assert decode_wav(b"OggS....") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None


def test_spark_image_and_audio_operators_real(spark):
    rows = [
        ("img1", "u1", "image", make_bmp(PIXELS), {"mime": "image/bmp"}),
        ("aud1", "u2", "audio", make_wav([0, 16384, -16384, 0] * 100),
         {"mime": "audio/wav"}),
    ]
    from kiwi_spark.operators.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [
            (a, u, k, bytearray(p), (m.get("mime"), None, None, None))
            for a, u, k, p, m in rows
        ],
        schema=ASSET_SCHEMA,
    )
    img = decode_image_features(assets).collect()  # fake=False: REAL decode
    assert len(img) == 1 and img[0]["width"] == 4 and img[0]["height"] == 2
    expected = _expected_luma(PIXELS)
    mean = sum(sum(r) for r in expected) / 8 / 255.0
    assert abs(img[0]["mean_luma"] - mean) < 1e-9

    aud = decode_audio_features(assets).collect()
    assert len(aud) == 1
    assert aud[0]["sample_rate"] == 8000
    assert aud[0]["duration_ms"] == 400 * 1000 // 8000


# --- PNG (pure stdlib-zlib decoder, VERDICT r2 #5) ---------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def make_png(rows: list[list[tuple]], color_type: int = 2,
             filters: list[int] | None = None,
             palette: list[tuple] | None = None) -> bytes:
    """Minimal PNG writer with per-row filter selection (forward-filtered
    per the spec, so the decoder must invert every filter type)."""
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    height = len(rows)
    width = len(rows[0])
    flat = [
        [c for px in row for c in (px if isinstance(px, tuple) else (px,))]
        for row in rows
    ]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = [0] * stride
    for y, line in enumerate(flat):
        f = filters[y]
        raw.append(f)
        for i in range(stride):
            left = line[i - channels] if i >= channels else 0
            up = prev[i]
            upleft = prev[i - channels] if i >= channels else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - left
            elif f == 2:
                v = line[i] - up
            elif f == 3:
                v = line[i] - ((left + up) >> 1)
            else:
                v = line[i] - _paeth(left, up, upleft)
            raw.append(v & 0xFF)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as z
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", z.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_decode_png_rgb_all_filters():
    from kiwi_spark.operators.multimodal import decode_png

    pixels = [
        [(255, 255, 255), (0, 0, 0), (255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (128, 128, 128), (255, 255, 0), (10, 20, 30)],
        [(1, 2, 3), (200, 100, 50), (255, 254, 253), (0, 128, 255)],
        [(7, 77, 177), (99, 98, 97), (13, 13, 13), (240, 10, 60)],
    ]
    for filters in ([0, 0, 0, 0], [1, 2, 3, 4], [4, 4, 4, 4], [0, 2, 1, 3]):
        payload = make_png(pixels, color_type=2, filters=filters)
        width, height, luma = decode_png(payload)
        assert (width, height) == (4, 4)
        expected = _expected_luma(pixels)
        for y in range(4):
            for x in range(4):
                assert abs(luma[y][x] - expected[y][x]) < 1e-9, (filters, y, x)


def test_decode_png_gray_palette_rgba():
    from kiwi_spark.operators.multimodal import decode_png

    # grayscale with Average filter
    gray = [[(10,), (20,), (30,)], [(40,), (50,), (60,)]]
    w, h, luma = decode_png(make_png(gray, color_type=0, filters=[0, 3]))
    assert (w, h) == (3, 2)
    assert [[luma[y][x] for x in range(3)] for y in range(2)] == [
        [10.0, 20.0, 30.0], [40.0, 50.0, 60.0]
    ]
    # palette
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx_rows = [[(0,), (1,)], [(2,), (1,)]]
    w, h, luma = decode_png(make_png(idx_rows, color_type=3, palette=pal))
    assert (w, h) == (2, 2)
    assert abs(luma[0][0] - 0.299 * 255) < 1e-9
    assert abs(luma[0][1] - 0.587 * 255) < 1e-9
    assert abs(luma[1][0] - 0.114 * 255) < 1e-9
    # RGBA: alpha ignored
    rgba = [[(100, 150, 200, 0), (1, 2, 3, 255)]]
    w, h, luma = decode_png(make_png(rgba, color_type=6, filters=[4]))
    assert (w, h) == (2, 1)
    assert abs(luma[0][0] - (0.299 * 100 + 0.587 * 150 + 0.114 * 200)) < 1e-9


def test_decode_png_rejects_unsupported():
    from kiwi_spark.operators.multimodal import decode_png

    assert decode_png(b"\xff\xd8\xffjpeg") is None
    good = make_png([[(1, 2, 3)]])
    # corrupt the zlib stream
    assert decode_png(good[:40] + b"\x00" * 8) is None


def test_spark_image_operator_decodes_png(spark):
    from kiwi_spark.operators.multimodal import ASSET_SCHEMA

    pixels = PIXELS
    payload = make_png(pixels, color_type=2, filters=[1, 4])
    assets = spark.createDataFrame(
        [("png1", "u1", "image", bytearray(payload), ("image/png", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    img = decode_image_features(assets).collect()  # fake=False: REAL decode
    assert len(img) == 1 and img[0]["width"] == 4 and img[0]["height"] == 2
    expected = _expected_luma(pixels)
    mean = sum(sum(r) for r in expected) / 8 / 255.0
    assert abs(img[0]["mean_luma"] - mean) < 1e-9
    # PNG and BMP of the SAME pixels produce the same luma → same ahash
    bmp = decode_image_features(
        spark.createDataFrame(
            [("bmp1", "u2", "image", bytearray(make_bmp(pixels)),
              ("image/bmp", None, None, None))],
            schema=ASSET_SCHEMA,
        )
    ).collect()
    assert bmp[0]["phash"] == img[0]["phash"]


# --- WAV sample-format family (PCM 8/24/32, float, G.711) --------------------


def make_wav_fmt(raw: bytes, audio_format: int, bits: int,
                 sample_rate: int = 8000, n_channels: int = 1,
                 extensible: bool = False) -> bytes:
    block = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        0xFFFE if extensible else audio_format,
        n_channels, sample_rate, sample_rate * block, block, bits,
    )
    if extensible:
        fmt += struct.pack("<HI", 22, 0)[:2]  # cbSize=22
        fmt += struct.pack("<H", bits)        # valid bits
        fmt += struct.pack("<I", 0)           # channel mask
        fmt += struct.pack("<H", audio_format) + b"\x00" * 14  # subformat GUID
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm8_pcm24_pcm32_float():
    from kiwi_spark.operators.multimodal import decode_wav

    # PCM-8 unsigned: 128 → 0.0, 255 → 0.9921875, 0 → -1.0
    rate, ch, _, rms, peak = decode_wav(
        make_wav_fmt(bytes([128, 255, 0]), 1, 8)
    )
    assert (rate, ch) == (8000, 1)
    assert abs(peak - 1.0) < 1e-12
    expected_rms = ((0.0 ** 2 + (127 / 128) ** 2 + 1.0) / 3) ** 0.5
    assert abs(rms - expected_rms) < 1e-12
    # PCM-24: +2^22 → 0.5, -2^23 → -1.0
    raw24 = struct.pack("<i", 1 << 22)[:3] + struct.pack("<i", -(1 << 23))[:3]
    _, _, _, rms, peak = decode_wav(make_wav_fmt(raw24, 1, 24))
    assert abs(peak - 1.0) < 1e-12
    assert abs(rms - ((0.25 + 1.0) / 2) ** 0.5) < 1e-12
    # PCM-32
    raw32 = struct.pack("<ii", 1 << 30, -(1 << 31))
    _, _, _, _, peak = decode_wav(make_wav_fmt(raw32, 1, 32))
    assert abs(peak - 1.0) < 1e-12
    # float32 passthrough
    rawf = struct.pack("<ff", 0.25, -0.5)
    _, _, _, rms, peak = decode_wav(make_wav_fmt(rawf, 3, 32))
    assert abs(peak - 0.5) < 1e-7 and abs(rms - ((0.0625 + 0.25) / 2) ** 0.5) < 1e-7
    # float64
    rawd = struct.pack("<dd", 0.125, -0.125)
    _, _, _, _, peak = decode_wav(make_wav_fmt(rawd, 3, 64))
    assert abs(peak - 0.125) < 1e-12


def _mulaw_encode(sample: int) -> int:
    """Independent spec-side μ-law compressor (ITU G.711)."""
    BIAS = 0x84
    sign = 0x80 if sample < 0 else 0
    if sample < 0:
        sample = -sample
    sample = min(sample + BIAS, 0x7FFF)
    seg = 7
    for s in range(8):
        if sample < (0x100 << s):
            seg = s
            break
    mantissa = (sample >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mantissa) & 0xFF


def test_wav_mulaw_roundtrip_and_extensible():
    from kiwi_spark.operators.multimodal import decode_wav

    values = [0, 1000, -1000, 8000, -8000, 30000, -30000]
    raw = bytes(_mulaw_encode(v) for v in values)
    decoded = decode_wav(make_wav_fmt(raw, 7, 8))
    assert decoded is not None
    # μ-law quantization error ≤ segment step; peak within 3% of 30000/32768
    _, _, _, _, peak = decoded
    assert abs(peak - 30000 / 32768.0) < 0.03
    # A-law anchor: byte 0x55 (a=0x00) → -8/32768 (smallest negative step)
    _, _, _, _, peak_a = decode_wav(make_wav_fmt(bytes([0x55]), 6, 8))
    assert abs(peak_a - 8 / 32768.0) < 1e-12
    # EXTENSIBLE wrapper resolves the sub-format
    samples = [0, 16384, -16384]
    raw16 = b"".join(struct.pack("<h", s) for s in samples)
    ext = decode_wav(make_wav_fmt(raw16, 1, 16, extensible=True))
    assert ext is not None and abs(ext[4] - 0.5) < 1e-12


def make_png_adam7(pixels: list[list[tuple]], color_type: int = 2) -> bytes:
    """Interlaced PNG writer: each Adam7 pass is an independently filtered
    sub-image (filter 0 rows, one pass gets filter 2 to exercise per-pass
    unfiltering)."""
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    height = len(pixels)
    width = len(pixels[0])
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    raw = bytearray()
    for pass_index, (x0, y0, dx, dy) in enumerate(passes):
        rows = [
            [c for x in range(x0, width, dx) for c in pixels[y][x]]
            for y in range(y0, height, dy)
        ]
        if not rows or not rows[0]:
            continue
        use_up = pass_index == 6 and len(rows) > 1
        prev = [0] * len(rows[0])
        for row in rows:
            if use_up:
                raw.append(2)  # Up filter
                raw += bytes((v - p) & 0xFF for v, p in zip(row, prev))
            else:
                raw.append(0)
                raw += bytes(row)
            prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as z
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", z.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_decode_png_adam7_interlaced():
    from kiwi_spark.operators.multimodal import decode_png

    # 9×10 RGB: every pixel distinct so any pass misplacement shows
    pixels = [
        [((x * 7 + y * 31) % 256, (x * 13 + y * 3) % 256, (x + y * 17) % 256)
         for x in range(9)]
        for y in range(10)
    ]
    w, h, luma = decode_png(make_png_adam7(pixels))
    assert (w, h) == (9, 10)
    for y in range(10):
        for x in range(9):
            r, g, b = pixels[y][x]
            assert abs(luma[y][x] - (0.299 * r + 0.587 * g + 0.114 * b)) < 1e-9, (y, x)
    # small image where several passes are empty
    tiny = [[(10, 20, 30), (40, 50, 60)]]
    w, h, luma = decode_png(make_png_adam7(tiny))
    assert (w, h) == (2, 1)
    assert abs(luma[0][0] - (0.299 * 10 + 0.587 * 20 + 0.114 * 30)) < 1e-9
