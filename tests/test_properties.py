"""Hypothesis property tests for the pure decode/chunk kernels.

Each property pins an invariant against an independent formulation
(round-trip through a spec-side encoder, or a brute-force oracle), so
regressions in the optimized implementations surface on inputs no
hand-written case thought of.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# chunk span resolution: the optimized fuzzy-find equals the naive scan
# ---------------------------------------------------------------------------

_text_strategy = st.text(
    alphabet=st.sampled_from(list("ab c\t\nd.!?x ")), min_size=0, max_size=80
)


def _naive_fuzzy_find(text: str, chunk: str, cursor: int):
    """The round-2 per-call implementation, kept as the oracle."""
    needle = " ".join(chunk.split())
    if not needle:
        return None
    normalized: list[str] = []
    index_map: list[int] = []
    pending_ws: int | None = None
    for i in range(max(0, cursor), len(text)):
        ch = text[i]
        if ch.isspace():
            if normalized and pending_ws is None:
                pending_ws = i
            continue
        if pending_ws is not None:
            normalized.append(" ")
            index_map.append(pending_ws)
            pending_ws = None
        normalized.append(ch)
        index_map.append(i)
    pos = "".join(normalized).find(needle)
    if pos < 0:
        return None
    return index_map[pos], index_map[pos + len(needle) - 1] + 1


@given(_text_strategy, _text_strategy, st.integers(min_value=0, max_value=90))
@settings(max_examples=300, deadline=None)
def test_fuzzy_find_equals_naive_scan(text, chunk, cursor):
    from kiwi_spark.functions.chunking import _fuzzy_find, _ws_norm_table

    _ws_norm_table.cache_clear()
    assert _fuzzy_find(text, chunk, cursor) == _naive_fuzzy_find(
        text, chunk, cursor
    )


# ---------------------------------------------------------------------------
# token counting: optimized loop equals the round-2 reference formulation
# ---------------------------------------------------------------------------

@given(st.text(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_count_tokens_equals_reference_formulation(text):
    from kiwi_spark.functions.tokens import _PRETOKEN, count_tokens_uncached
    from kiwi_spark.functions.bpe import get_default_encoder

    if get_default_encoder() is not None:  # exact path active: skip
        return
    normalized = text.strip()
    expected = 0
    for match in _PRETOKEN.finditer(normalized):
        piece = match.group(0)
        if piece.isspace():
            expected += len(piece) // 8
            continue
        nbytes = len(piece.encode("utf-8"))
        expected += max(1, (nbytes + 3) // 4)
    assert count_tokens_uncached(text) == expected


# ---------------------------------------------------------------------------
# PNG: decode(encode(pixels, any filters)) == pixels
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_random_pixels_and_filters(width, height, data):
    from test_multimodal_real import make_png
    from kiwi_spark.operators.multimodal import decode_png

    pixels = [
        [
            tuple(
                data.draw(st.integers(min_value=0, max_value=255))
                for _ in range(3)
            )
            for _ in range(width)
        ]
        for _ in range(height)
    ]
    filters = [
        data.draw(st.integers(min_value=0, max_value=4)) for _ in range(height)
    ]
    w, h, luma = decode_png(make_png(pixels, color_type=2, filters=filters))
    assert (w, h) == (width, height)
    for y in range(height):
        for x in range(width):
            r, g, b = pixels[y][x]
            assert abs(luma[y][x] - (0.299 * r + 0.587 * g + 0.114 * b)) < 1e-9


# ---------------------------------------------------------------------------
# GIF: LZW literal encoding round-trips arbitrary palette indices
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_random_pixels(width, height, data):
    from test_gif_decode import make_gif, PAL4, _luma
    from kiwi_spark.functions.gif_decode import decode_gif

    rows = [
        [data.draw(st.integers(min_value=0, max_value=3)) for _ in range(width)]
        for _ in range(height)
    ]
    w, h, luma = decode_gif(make_gif(width, height, PAL4, rows))
    assert (w, h) == (width, height)
    for y in range(height):
        for x in range(width):
            assert abs(luma[y][x] - _luma(PAL4[rows[y][x]])) < 1e-9


# ---------------------------------------------------------------------------
# G.711 μ-law: decode(encode(x)) within one quantization step of x
# ---------------------------------------------------------------------------

@given(st.integers(min_value=-32124, max_value=32124))
@settings(max_examples=300, deadline=None)
def test_mulaw_roundtrip_within_quantization_step(sample):
    from test_multimodal_real import _mulaw_encode
    from kiwi_spark.operators.multimodal import _g711_mulaw_table

    table = _g711_mulaw_table()
    decoded = table[_mulaw_encode(sample)] * 32768.0
    # μ-law segment k quantizes with step 2^(k+3); error ≤ half a step of
    # the largest segment the sample can land in
    magnitude = abs(sample) + 0x84
    segment = max(0, magnitude.bit_length() - 8)
    assert abs(decoded - sample) <= (1 << (segment + 3))


# ---------------------------------------------------------------------------
# WAV PCM-16: rms/peak equal a float-side computation for random samples
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_wav_pcm16_stats_match_numpy(samples):
    from test_multimodal_real import make_wav
    from kiwi_spark.operators.multimodal import decode_wav

    _, _, _, rms, peak = decode_wav(make_wav(samples))
    floats = np.asarray(samples, dtype=np.float64) / 32768.0
    assert abs(rms - float(np.sqrt((floats ** 2).mean()))) < 1e-12
    assert abs(peak - float(np.abs(floats).max())) < 1e-12
