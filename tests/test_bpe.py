"""The tiktoken-compatible BPE engine (functions/bpe.py).

The real o200k ranks file can't be vendored (no network in this build
env), so correctness is pinned three ways that don't need it: the merge
loop against hand-computed toy ranks, the .tiktoken loader round-trip,
and the published o200k pre-tokenization pattern against hand-derived
splits. With a ranks file present (env var), count_tokens switches to
the exact encoder — also tested here with toy ranks.
"""

from __future__ import annotations

import base64

import regex

from kiwi_spark.functions.bpe import (
    O200K_PATTERN,
    BPEEncoder,
    get_default_encoder,
    load_ranks,
)


def test_bpe_merge_order_hand_computed():
    # parts h,e,l,l,o: ll (rank 0) fuses first, then he (1), then ll+o (2)
    ranks = {b"he": 1, b"ll": 0, b"llo": 2}
    enc = BPEEncoder(ranks, pattern=r"\S+")
    assert enc.encode("hello") == [1, 2]
    assert enc.count("hello") == 2
    # direct vocabulary hit is a single token without any merging
    ranks2 = {b"hello": 7, b"he": 1, b"ll": 0}
    assert BPEEncoder(ranks2, pattern=r"\S+").encode("hello") == [7]
    # no fusable pairs → one token per byte
    assert BPEEncoder({}, pattern=r"\S+").count("abc") == 3


def test_bpe_lowest_rank_wins_ties_leftmost():
    # equal-rank pairs: the leftmost is merged (strict < comparison)
    ranks = {b"ab": 5, b"cd": 5, b"abcd": 9, b"abc": 11}
    enc = BPEEncoder(ranks, pattern=r"\S+")
    # a,b,c,d → merge ab (leftmost of the rank-5 pair) → ab,c,d →
    # merge cd → ab,cd → merge abcd → [9]
    assert enc.encode("abcd") == [9]


def test_tiktoken_file_loader(tmp_path):
    path = tmp_path / "toy.tiktoken"
    entries = {b"a": 0, b"b": 1, b"ab": 2, "é".encode(): 3}
    path.write_bytes(
        b"\n".join(
            base64.b64encode(token) + b" " + str(rank).encode()
            for token, rank in entries.items()
        )
        + b"\n\n"
    )
    ranks = load_ranks(str(path))
    assert ranks == entries
    enc = BPEEncoder(ranks, pattern=r"\S+")
    assert enc.encode("ab") == [2]
    assert enc.encode("é") == [3]


def test_o200k_pretokenization_pattern():
    """Hand-derived splits of the published o200k_base pattern: digit runs
    cap at 3, contractions fuse, words carry their leading space, trailing
    whitespace separates from intra-line whitespace."""
    pat = regex.compile(O200K_PATTERN)

    def split(s):
        return [m.group(0) for m in pat.finditer(s)]

    assert split("Hello world") == ["Hello", " world"]
    assert split("I'm 1234 fine!\n") == ["I'm", " ", "123", "4", " fine", "!\n"]
    assert split("don't STOP 42x") == ["don't", " STOP", " ", "42", "x"]
    assert split("  \n\n  tab\tend  ") == ["  \n\n", " ", " tab", "\tend", "  "]


def test_count_tokens_switches_to_exact_with_ranks(tmp_path, monkeypatch):
    from kiwi_spark.functions import tokens
    from kiwi_spark.functions import bpe

    path = tmp_path / "ranks.tiktoken"
    # single-byte vocab for h,e,l,o plus the merges from the toy example
    entries = {b"h": 0, b"e": 1, b"l": 2, b"o": 3, b"ll": 4, b"he": 5, b"llo": 6}
    path.write_bytes(
        b"\n".join(
            base64.b64encode(t) + b" " + str(r).encode()
            for t, r in entries.items()
        )
    )
    monkeypatch.setenv(bpe.ENV_VAR, str(path))
    get_default_encoder.cache_clear()
    tokens.count_tokens.cache_clear()
    try:
        # "hello" → [he, llo] = exactly 2 tokens (approximation gives 2
        # as well for this word, so check a case where they differ)
        assert tokens.count_tokens_uncached("hello") == 2
        # 8 repeated words: exact = 16 tokens (each " hello" piece merges
        # to [ he, llo ] — leading-space variants missing from the toy
        # vocab fall back to per-byte parts)
        exact = tokens.count_tokens_uncached("hello " * 3)
        monkeypatch.delenv(bpe.ENV_VAR)
        get_default_encoder.cache_clear()
        tokens.count_tokens.cache_clear()
        approx = tokens.count_tokens_uncached("hello " * 3)
        assert exact != approx  # the exact path really engaged
    finally:
        get_default_encoder.cache_clear()
        tokens.count_tokens.cache_clear()
