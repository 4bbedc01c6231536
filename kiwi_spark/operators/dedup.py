"""Document deduplication operators for large-scale corpus curation.

All four variants are first-class operators over a ``documents(doc_id, text)``
table (SURVEY/driver contract: deduplication as core training-data ops):

* exact          — hash-groupBy on normalized text (1 shuffle)
* n-gram Jaccard — shingle explode → self-join on shingle → count-based
                   Jaccard (the exact baseline; quadratic only within
                   shingle-sharing groups)
* MinHash + LSH  — k independent min-hashes via xxhash64(seed, shingle)
                   (JVM-side, whole-stage codegen), banded into buckets,
                   candidate pairs verified with exact Jaccard
* SimHash        — 64-bit weighted-sign fingerprint (vectorized pandas UDF),
                   16-bit band blocking, Hamming-distance verify JVM-side

Scale notes: every operator blocks before pairing (no corpus-wide cross
join); shingle explosion is bounded by words-per-doc; band buckets cap the
candidate set. Skewed shingles (stopword-only grams) are the classic hazard
— ``ngram_jaccard_pairs`` drops shingles above ``max_shingle_df`` docs,
mirroring df-based pruning in web-scale dedup systems.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16


def _tokens(col: str = "text"):
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(col)), r"[^a-z0-9]+", " ")), r"\s+"
    )


def _shingles(n: int, col: str = "text"):
    """Word n-gram shingles as an array column (JVM-side)."""
    tokens = _tokens(col)
    return F.when(
        F.size(tokens) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens) - n),
                lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", tokens)))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (whitespace-normalized) texts.

    Returns (doc_id, canonical_id, group_size) for docs in groups of ≥2.
    """
    # collapse first, trim last — trim() only strips spaces, so a trailing
    # "\n" must be collapsed to " " before trimming
    normalized = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    keyed = docs.select(F.col(id_col).alias("doc_id"), normalized.alias("norm"))
    groups = keyed.groupBy("norm").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        keyed.join(groups, "norm")
        .where(F.col("group_size") >= 2)
        .select("doc_id", "canonical_id", "group_size")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.6,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets for all pairs sharing ≥1
    shingle. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"), _shingles(n, text_col).alias("shingles")
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        keep = (
            exploded.groupBy("shingle")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(keep, "shingle")
    left = exploded.select(F.col("doc_id").alias("doc_a"), "shingle")
    right = exploded.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("intersection"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("intersection") / (F.col("na") + F.col("nb") - F.col("intersection")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = DEFAULT_NUM_HASHES,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>) — k independent min-hashes, all JVM-side."""
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_shingles(n, text_col)).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.6,
                      num_hashes: int = DEFAULT_NUM_HASHES, bands: int = DEFAULT_BANDS,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash banding → candidate pairs → exact-Jaccard verification.

    band/bucket join keeps the candidate set near-linear; the verify step
    re-joins shingle sets only for candidates.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, id_col, text_col)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bucket"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # verify candidates with exact jaccard
    sh = docs.select(
        F.col(id_col).alias("doc_id"), _shingles(n, text_col).alias("shingles")
    )
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"),
                            F.col("shingles").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"),
                        F.col("shingles").alias("sb")), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sa", "sb"))
            / F.size(F.array_union("sa", "sb")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (vectorized numpy accumulate)."""
    out = []
    shifts = np.arange(64, dtype=np.uint64)
    bit_cache: dict[str, np.ndarray] = {}  # token → ±1 bit vector (vocab cache)
    for text in texts:
        tokens = [t for t in (text or "").lower().split() if t]
        if not tokens:
            out.append(0)
            continue
        acc = np.zeros(64, dtype=np.int64)
        for token in tokens:
            bits = bit_cache.get(token)
            if bits is None:
                h = np.uint64(_fnv1a64(token.encode("utf-8")))
                bits = np.where(
                    ((h >> shifts) & np.uint64(1)).astype(np.int64) == 1, 1, -1
                )
                bit_cache[token] = bits
            acc += bits
        fp = 0
        for i in range(64):
            if acc[i] > 0:
                fp |= 1 << i
        # two's-complement into signed 64-bit for Spark LongType
        out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
    return pd.Series(out)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs by SimHash: 16-bit band blocking (any pair within
    Hamming ≤3 of 64 bits shares ≥1 of 4 bands), then exact Hamming verify."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("fp")
    )
    bands = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("fp", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("piece"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bp"),
    ).select("doc_id", "fp", "bp.band", "bp.piece")
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "piece"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.fp").alias("fa"),
            F.col("r.fp").alias("fb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# Embedding near-duplicates (cosine)
# --------------------------------------------------------------------------

def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_planes: int = 8, n_sketches: int = 4,
                        seed: int = 13) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold: sign-LSH bucket blocking
    (hyperplane sketches; a cos≥0.99 pair collides in ≥1 of the staggered
    sketches with p≈1-(1-0.77)^n_sketches ≈ 0.997 at the defaults),
    verified exactly on candidates."""
    rng = np.random.RandomState(seed)
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    planes = [rng.randn(dim).tolist() for _ in range(n_sketches * n_planes)]

    def sketch(plane_set: list[list[float]], name: str):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        F.array(*[F.lit(float(x)) for x in plane]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            for plane in plane_set
        ]
        expr = F.lit(0)
        for bit in bits:
            expr = expr * 2 + bit
        return expr.alias(name)

    bucket_cols = [
        sketch(planes[i * n_planes : (i + 1) * n_planes], f"b{i}")
        for i in range(n_sketches)
    ]
    sk = embeddings.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec"), *bucket_cols
    )
    cands = None
    for bucket in [f"b{i}" for i in range(n_sketches)]:
        c = (
            sk.alias("l")
            .join(sk.alias("r"), bucket)
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.col("l.vec").alias("va"),
                F.col("r.vec").alias("vb"),
            )
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["doc_a", "doc_b"])
    dot = F.aggregate(
        F.zip_with(F.col("va").cast("array<double>"),
                   F.col("vb").cast("array<double>"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(F.col(c).cast("array<double>"), lambda x: x * x),
                    F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        cands.withColumn("cosine", dot / (norm("va") * norm("vb")))
        .where(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine"))
    )
