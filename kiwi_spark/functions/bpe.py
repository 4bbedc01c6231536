"""o200k_base BPE engine (tiktoken-compatible), with pluggable ranks data.

The reference counts tokens with js-tiktoken's o200k_base encoding
(packages/graph/src/chunking/semantic.ts:49-69,
packages/ai/src/index.ts:264-270). This module implements the exact
encoder ALGORITHM — regex pre-tokenization with the published o200k_base
pattern, then greedy lowest-rank byte-pair merging — and loads the ranks
table from a standard ``.tiktoken`` file (``<base64 token> <rank>`` per
line) when one is available:

1. ``$KIWI_SPARK_O200K_RANKS`` (explicit path), else
2. ``kiwi_spark/data/o200k_base.tiktoken`` (vendored location).

The o200k ranks file itself (~4 MB; public at
``openaipublic.blob.core.windows.net/encodings/o200k_base.tiktoken``) is
NOT vendored here because this build environment has no network access.
When the file is present, ``kiwi_spark.functions.tokens.count_tokens``
switches to exact o200k counts automatically (chunk boundaries and
token_count columns then match what real kiwi computes); without it, the
documented BPE-shaped approximation in tokens.py remains in force.

The merge loop is the standard public BPE algorithm (tiktoken's
``byte_pair_merge``): repeatedly fuse the adjacent pair with the lowest
rank until no fusable pair remains. Algorithmic correctness is pinned by
hand-computed toy-ranks tests (tests/test_bpe.py) independent of the
real data file.
"""

from __future__ import annotations

import base64
import os
from functools import lru_cache

# The published o200k_base pre-tokenization pattern (tiktoken
# openai_public.py / js-tiktoken ranks/o200k_base — public knowledge).
# Needs the `regex` module for \p{} unicode classes.
O200K_PATTERN = "|".join(
    [
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*"
        r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?",
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+"
        r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?",
        r"\p{N}{1,3}",
        r" ?[^\s\p{L}\p{N}]+[\r\n/]*",
        r"\s*[\r\n]+",
        r"\s+(?!\S)",
        r"\s+",
    ]
)

DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "o200k_base.tiktoken",
)
ENV_VAR = "KIWI_SPARK_O200K_RANKS"


def load_ranks(path: str) -> dict[bytes, int]:
    """Parse a ``.tiktoken`` ranks file: one ``<base64(token)> <rank>``
    pair per line, blank lines ignored."""
    ranks: dict[bytes, int] = {}
    with open(path, "rb") as handle:
        for line in handle:
            line = line.strip()
            if not line:
                continue
            token_b64, rank = line.split()
            ranks[base64.b64decode(token_b64)] = int(rank)
    return ranks


class BPEEncoder:
    """tiktoken-compatible byte-pair encoder over a ranks table."""

    def __init__(self, ranks: dict[bytes, int], pattern: str = O200K_PATTERN):
        import regex

        self.ranks = ranks
        self._pattern = regex.compile(pattern)

    def _encode_piece(self, piece: bytes) -> list[int]:
        ranks = self.ranks
        direct = ranks.get(piece)
        if direct is not None:
            return [direct]
        parts = [piece[i : i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank = None
            best_index = None
            for i in range(len(parts) - 1):
                rank = ranks.get(parts[i] + parts[i + 1])
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_index = i
            if best_index is None:
                break
            parts[best_index : best_index + 2] = [
                parts[best_index] + parts[best_index + 1]
            ]
        # every part should be a rank entry (all 256 single bytes are);
        # unknown parts still cost one token each, so count() never lies
        return [ranks.get(p, -1) for p in parts]

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for match in self._pattern.finditer(text):
            out.extend(self._encode_piece(match.group(0).encode("utf-8")))
        return out

    def count(self, text: str) -> int:
        return len(self.encode(text))


def _ranks_path() -> str | None:
    explicit = os.environ.get(ENV_VAR)
    if explicit and os.path.exists(explicit):
        return explicit
    if os.path.exists(DATA_PATH):
        return DATA_PATH
    return None


@lru_cache(maxsize=4)
def _encoder_for(path: str) -> BPEEncoder:
    return BPEEncoder(load_ranks(path))


@lru_cache(maxsize=1)
def get_default_encoder() -> BPEEncoder | None:
    """The exact o200k encoder when ranks data is available, else None
    (callers fall back to the documented approximation). Resolution is
    cached per process — it sits in the per-document hot path; tests that
    swap ranks call ``get_default_encoder.cache_clear()``."""
    path = _ranks_path()
    return _encoder_for(path) if path else None
