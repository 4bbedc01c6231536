"""Deterministic token counting.

The reference counts o200k_base BPE tokens via js-tiktoken
(packages/graph/src/chunking/semantic.ts:49-69, packages/ai/src/index.ts:264-270).

Two paths, resolved once per process:

* EXACT — when an o200k_base ranks file is available (see
  ``functions.bpe``: ``$KIWI_SPARK_O200K_RANKS`` or
  ``kiwi_spark/data/o200k_base.tiktoken``), counts come from the real
  tiktoken-compatible BPE encoder, matching js-tiktoken's numbers.
* APPROXIMATE — this build environment has no network access to fetch
  the public ranks data, so the fallback is a deterministic, pure-Python
  approximation with the same *shape*: a GPT-style pre-tokenizer regex
  followed by a byte-length cost per piece (BPE yields roughly one token
  per ~4 UTF-8 bytes of word text). Token counts only drive chunk
  boundaries and the reported ``token_count`` column — they never affect
  extracted-text byte identity or the emitted triple set — so any stable,
  monotone counter preserves the reference's semantics. Pin: the counter
  is part of this repo, therefore identical across executors and runs.
"""

from __future__ import annotations

import re
from functools import lru_cache

# GPT-2/o200k-style pre-tokenization: contractions, letter runs, digit runs
# (BPE groups digits in threes), punctuation runs, whitespace runs.
_PRETOKEN = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"|[^\W\d_]+"
    r"|\d{1,3}"
    r"|[^\w\s]+"
    r"|\s+",
    re.UNICODE,
)


def count_tokens_uncached(text: str) -> int:
    """BPE token count: exact o200k when ranks data is present, else the
    deterministic approximation. Deterministic either way."""
    from .bpe import get_default_encoder

    encoder = get_default_encoder()
    if encoder is not None:
        return encoder.count(text)
    normalized = text.strip()
    if not normalized:
        return 0
    total = 0
    # findall (no Match objects) + ascii fast path: ~2× faster than the
    # round-2 finditer loop with identical outputs (len == utf-8 len for
    # ascii pieces; (n+3)//4 ≥ 1 for n ≥ 1 so the old max(1, …) was
    # redundant). This sits in the per-document kernel hot path.
    for piece in _PRETOKEN.findall(normalized):
        if piece.isspace():
            # whitespace mostly fuses into the following token; long runs cost
            total += len(piece) >> 3
            continue
        nbytes = len(piece)
        if not piece.isascii():
            nbytes = len(piece.encode("utf-8"))
        total += (nbytes + 3) >> 2
    return total


@lru_cache(maxsize=65536)
def count_tokens(text: str) -> int:
    """Memoized per executor, mirroring the reference's TokenCounter cache
    (semantic.ts:49-69)."""
    return count_tokens_uncached(text)
