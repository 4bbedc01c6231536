"""Exact o200k_base count suite — engages automatically when the real
ranks data is present (VERDICT r3 #2).

Activation flow (zero code changes):
    python tools/fetch_o200k.py          # network deployment env
    python tools/make_o200k_goldens.py   # stamp goldens (tiktoken-verified
                                         # when the package is importable)
    python -m pytest tests/test_o200k_exact.py -q

Without the ranks file every test here SKIPS (this sandbox has no
network); the toy-ranks algorithm tests in tests/test_bpe.py still pin
the merge loop, loader and pattern unconditionally. A toy/truncated
ranks file (< 150k entries) also skips — these tests assert facts about
the real vocabulary.
"""

from __future__ import annotations

import json
import os

import pytest

from kiwi_spark.functions.bpe import _ranks_path, get_default_encoder

# multilingual fixture set: scripts, contractions, digits, emoji, code,
# whitespace shapes — the surfaces where approximation and BPE diverge most
FIXTURES = [
    "Hello world",
    "The quick brown fox jumps over the lazy dog.",
    "I'm sure they'll've finished by 2026-08-16, won't they?",
    "Müller GmbH übernimmt Geschäftsführung in Köln.",
    "L'été dernier, j'ai visité la forêt enchantée.",
    "数据处理管道在大规模集群上运行良好。",
    "東京タワーは1958年に完成しました。",
    "معالجة البيانات على نطاق واسع باستخدام سبارك",
    "Обработка данных в распределённой системе",
    "🚀 emoji + symbols: ∑(xᵢ²) ≈ 42 — ✓ done!",
    "def tokenize(text: str) -> list[str]:\n    return text.split()\n",
    "   leading spaces\tand\ttabs\n\n\nand blank lines   ",
    "1234567890 12 345 6789",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "",
]

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "goldens", "o200k_counts.json"
)


def _real_encoder():
    if _ranks_path() is None:
        return None
    get_default_encoder.cache_clear()
    encoder = get_default_encoder()
    if encoder is None or len(encoder.ranks) < 150_000:
        return None
    return encoder


requires_ranks = pytest.mark.skipif(
    _real_encoder() is None,
    reason="real o200k_base ranks data not present "
    "(run tools/fetch_o200k.py to activate exact counting)",
)


@requires_ranks
def test_vocabulary_facts():
    encoder = _real_encoder()
    ranks = encoder.ranks
    assert all(bytes([b]) in ranks for b in range(256))
    assert len(ranks) > 150_000
    assert min(ranks.values()) == 0


@requires_ranks
def test_count_tokens_uses_exact_engine():
    """Dropping the ranks file in flips count_tokens to the exact encoder
    with zero code changes."""
    from kiwi_spark.functions import tokens

    encoder = _real_encoder()
    tokens.count_tokens.cache_clear()
    for text in FIXTURES:
        assert tokens.count_tokens_uncached(text) == encoder.count(text)


@requires_ranks
def test_counts_match_committed_goldens():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("goldens not stamped yet — run tools/make_o200k_goldens.py")
    with open(GOLDEN_PATH, encoding="utf-8") as handle:
        goldens = json.load(handle)
    encoder = _real_encoder()
    mismatches = {
        t: (encoder.count(t), expected)
        for t, expected in goldens.items()
        if encoder.count(t) != expected
    }
    assert not mismatches, mismatches


@requires_ranks
def test_counts_match_real_tiktoken_if_installed():
    tiktoken = pytest.importorskip("tiktoken")
    ext = tiktoken.get_encoding("o200k_base")
    encoder = _real_encoder()
    for text in FIXTURES:
        assert encoder.count(text) == len(ext.encode(text)), text
        assert encoder.encode(text) == ext.encode(text), text


@requires_ranks
def test_piece_concatenation_invariant():
    """Counting a document equals summing counts over its pre-token pieces
    — the property the chunker relies on when it caches per-piece counts."""
    import regex

    from kiwi_spark.functions.bpe import O200K_PATTERN

    encoder = _real_encoder()
    pat = regex.compile(O200K_PATTERN)
    doc = " ".join(FIXTURES)
    total = sum(
        len(encoder._encode_piece(m.group(0).encode("utf-8")))
        for m in pat.finditer(doc)
    )
    assert encoder.count(doc) == total
