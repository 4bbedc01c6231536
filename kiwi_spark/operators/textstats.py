"""Text analysis operators for corpus curation: language-ID, quality
scoring, token counting, document fingerprinting.

All JVM-side column expressions (whole-stage codegen; no Python in the hot
path), each with an exact ANSI-SQL twin used as the DuckDB oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# marker-token profiles per language (deterministic lang-ID heuristic;
# scoring = marker-token hit count, argmax with deterministic tie-break)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def _tokens(col: str) -> Column:
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(col)), r"[^\p{L}\p{N}]+", " ")), r"\s+"
    )


def _with_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, _text, _toks) — the unicode tokenizer materialized ONCE per
    row in its own projection. The operators below reference the token
    array several times each (scores, ratios, aggregates); left inline,
    every reference re-runs the regexp split per row (and HOF lambdas
    would re-run it per element). CollapseProject keeps the projections
    separate because ``_toks`` is a non-trivial expression with multiple
    downstream references."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        _tokens(text_col).alias("_toks"),
    )


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, cjk_ratio) — CJK-char ratio short-circuit for zh,
    else argmax marker-hit count, 'und' when all zero."""
    base = _with_tokens(docs, id_col, text_col)
    tokens = F.col("_toks")
    n_chars = F.length(F.col("_text"))
    cjk = F.length(F.regexp_replace(F.col("_text"), r"[^一-鿿]", ""))
    cjk_ratio = F.when(n_chars > 0, cjk / n_chars).otherwise(F.lit(0.0))

    scores = {code: _marker_hits(tokens, markers) for code, markers in LANG_MARKERS.items()}
    best = F.lit("und")
    best_score = F.lit(0)
    # deterministic order: iterate in fixed code order; strictly-greater wins
    for code in sorted(LANG_MARKERS):
        best = F.when(scores[code] > best_score, F.lit(code)).otherwise(best)
        best_score = F.when(scores[code] > best_score, scores[code]).otherwise(best_score)
    pred = F.when(cjk_ratio > 0.3, F.lit("zh")).otherwise(best)
    return base.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(cjk_ratio, 6).alias("cjk_ratio"),
    )


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score (Gopher/C4-style gates):
    word count, mean word length, stopword ratio, distinct-token ratio,
    alnum ratio."""
    base = _with_tokens(docs, id_col, text_col)
    tokens = F.col("_toks")
    n_words = F.size(tokens)
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t)) / n_words,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_words > 0, _marker_hits(tokens, STOPWORDS_EN) / n_words
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_words > 0, F.size(F.array_distinct(tokens)) / n_words
    ).otherwise(F.lit(0.0))
    n_chars = F.length(F.col("_text"))
    alnum_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.col("_text"), r"[^\p{L}\p{N}]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.25)).otherwise(0.0)
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.25)).otherwise(0.0)
        + F.when(distinct_ratio >= 0.1, F.lit(0.25)).otherwise(0.0)
        + F.when(alnum_ratio >= 0.6, F.lit(0.25)).otherwise(0.0)
    )
    return base.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (ceil(wordbytes/4) per
    word — the engine's deterministic o200k substitute, SQL-expressible)."""
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    tokens = _tokens(text_col)
    bpe_est = F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.greatest(F.lit(1), F.ceil(F.octet_length(t) / 4)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(F.trim(F.col(text_col))) > 0, ws_tokens)
        .otherwise(0)
        .cast("long")
        .alias("ws_tokens"),
        bpe_est.cast("long").alias("bpe_tokens_est"),
    )


def doc_fingerprints(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of normalized text (portable exact-dup key)
    + winnowing-style min-hash of k-gram windows (min md5 over all word
    k-grams — a rolling-window content signature).

    The normalized text and its token split are materialized in their own
    projections: the k-gram lambda references the token array per window,
    and an inlined split-over-regexp subtree would re-run per k-gram
    (interpreted HOF semantics — same fix as dedup._shingle_df)."""
    normed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ").alias(
            "_norm"
        ),
    )
    toks = normed.select("doc_id", "_norm", F.split("_norm", " ").alias("_toks"))
    tokens = F.col("_toks")
    kgrams = F.when(
        F.size(tokens) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tokens, i + 1, k))),
        ),
    ).otherwise(F.array(F.md5(F.col("_norm"))))
    return toks.select(
        "doc_id",
        F.md5(F.col("_norm")).alias("md5_fingerprint"),
        F.array_min(kgrams).alias("min_kgram_fingerprint"),
    )
