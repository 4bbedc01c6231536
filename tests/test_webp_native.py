"""Real-encoder validation of the from-spec VP8L decoder + the native
lossy-WebP decode path (functions/webp_native.py).

ADVICE r4 asked for validation of webp_decode against a REAL
libwebp-encoded file — hand-packed fixtures can encode the same bug the
decoder has (that is exactly how the cross-color channel swap survived
round 4). The system libwebp (present on most Linux platforms; gated
skipif here) provides the independent encoder: encode deterministic RGBA
→ decode with OUR decoder → pixel-exact match. Each case is chosen to
push the encoder into a different VP8L transform."""

import numpy as np
import pytest

from kiwi_spark.functions.webp_decode import decode_webp
from kiwi_spark.functions.webp_native import (
    available,
    decode_luma,
    encode_lossless_rgba,
    encode_lossy_rgba,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="system libwebp not present"
)


def _luma_of(rgba, w, h):
    a = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4)
    return (
        0.299 * a[:, :, 0].astype(np.float64)
        + 0.587 * a[:, :, 1]
        + 0.114 * a[:, :, 2]
    )


def _make(w, h, fn):
    a = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            r, g, b = fn(x, y)
            a[y, x] = (r & 255, g & 255, b & 255, 255)
    return a.tobytes()


# deterministic pseudo-noise (hash() is salted per-process — not usable)
def _nz(x, y, k):
    v = (x * 2654435761 + y * 40503 + k * 69427) & 0xFFFFFFFF
    return (v >> 13) & 255


CASES = {
    # smooth gradient → spatial predictors
    "gradient": (61, 37, lambda x, y: (x * 4, y * 6, (x + y) * 2)),
    # noise → color cache / literal-heavy coding
    "noise": (32, 24, lambda x, y: (_nz(x, y, 1), _nz(x, y, 2), _nz(x, y, 3))),
    # 4 colors → palette (color indexing + sub-byte bundling)
    "palette": (
        40, 30,
        lambda x, y: [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)][
            (x // 5 + y // 3) % 4
        ],
    ),
    # channel-correlated ramp → cross-color transform (the r4 bug's trigger)
    "correlated": (48, 48, lambda x, y: (x * 3, x * 3 + y, x * 3 + 2 * y)),
    # periodic columns → LZ77 back-references across rows
    "repeats": (64, 40, lambda x, y: ((x * 7) % 256, (x * 13) % 256, (x * 3) % 256)),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_vp8l_decoder_matches_real_libwebp_encoder(name):
    w, h, fn = CASES[name]
    rgba = _make(w, h, fn)
    enc = encode_lossless_rgba(rgba, w, h)
    assert enc is not None
    got = decode_webp(enc)
    assert got is not None, "from-spec decoder rejected a real VP8L stream"
    gw, gh, luma = got
    assert (gw, gh) == (w, h)
    assert np.allclose(np.asarray(luma), _luma_of(rgba, w, h))


def test_native_lossy_decode_through_multimodal(spark):
    """Lossy VP8 streams decode via the native path in the image-feature
    operator: true dimensions, luma close to the source (lossy)."""
    from kiwi_spark.operators.multimodal import decode_image_features

    w, h = 48, 32
    rgba = _make(w, h, lambda x, y: (x * 5, 128, y * 7))
    lossy = encode_lossy_rgba(rgba, w, h, quality=90.0)
    assert lossy is not None and lossy[12:16] == b"VP8 "
    # the from-spec VP8L decoder stays honest: lossy is not its format
    assert decode_webp(lossy) is None

    from kiwi_spark.operators.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [("a1", "u1", "image", bytearray(lossy), ("image/webp", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    rows = decode_image_features(assets).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["width"] == w and row["height"] == h
    expected = float(_luma_of(rgba, w, h).mean()) / 255.0
    assert abs(row["mean_luma"] - expected) < 0.05


def test_native_decode_luma_rejects_garbage():
    assert decode_luma(b"RIFF\x00\x00\x00\x00WEBPgarbage") is None
    assert decode_luma(b"") is None


def test_vp8x_wrapped_lossless_decodes_from_spec():
    """Real-world lossless files carrying metadata (EXIF/ICC) wrap the
    VP8L stream in a VP8X container; the from-spec decoder's chunk walk
    must reach the VP8L chunk behind VP8X/ICCP."""
    import struct

    w, h = 20, 10
    rgba = bytes(
        bytearray(
            [(x * 37) % 256 for y in range(h) for x in range(w) for _ in range(4)]
        )
    )
    enc = encode_lossless_rgba(rgba, w, h)
    assert enc[12:16] == b"VP8L"
    (size,) = struct.unpack_from("<I", enc, 16)
    vp8l = enc[20 : 20 + size]

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    inner = (
        chunk(b"VP8X", bytes([0x20, 0, 0, 0])
              + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
        + chunk(b"ICCP", b"fakeprofile")
        + chunk(b"VP8L", vp8l)
    )
    container = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP" + inner
    got = decode_webp(container)
    direct = decode_webp(enc)
    assert got is not None and (got[0], got[1]) == (w, h)
    assert np.allclose(np.asarray(got[2]), np.asarray(direct[2]))
