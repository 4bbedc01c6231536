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
