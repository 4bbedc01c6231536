"""Stage 5: materialize nodes/edges/mentions + lineage/metrics.

* entity-hash bucketing: outputs are repartitioned by a bucket column
  ``bucket = pmod(xxhash64(id), n_buckets)`` and written
  partitionBy(bucket) — the parquet stand-in for Iceberg's
  ``bucket(entity_id)`` partition transform (SURVEY §1.2), giving
  partition-pruned point lookups and co-partitioned graph joins.
* deterministic embeddings (L13 substitute): hashing-TF of the description
  into a 64-dim float array via one Arrow-vectorized pandas UDF — used by
  query-side ranking (plans.queries) and similarity ops.
* lineage/metrics: one row per output partition per stage
  (stage, partition_id, row_count, url_count) + wall time, appended to the
  ``lineage`` table (north_star: "per-partition lineage and metrics rows").
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, FloatType

EMBEDDING_DIM = 64


@F.pandas_udf(ArrayType(FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    """Deterministic hashing-TF embedding, L2-normalized.

    Token → (bucket, sign) is memoized per Arrow batch (corpus vocabularies
    are tiny relative to row counts), so the hot loop is one dict hit +
    one numpy add per token."""
    out = []
    cache: dict[str, tuple[int, float]] = {}
    for text in texts:
        vec = np.zeros(EMBEDDING_DIM, dtype=np.float32)
        for token in (text or "").upper().split():
            hit = cache.get(token)
            if hit is None:
                h = hash_token(token)
                hit = (h % EMBEDDING_DIM, 1.0 if (h >> 7) % 2 == 0 else -1.0)
                cache[token] = hit
            vec[hit[0]] += hit[1]
        norm = float(np.linalg.norm(vec))
        if norm > 0:
            vec /= norm
        out.append(vec.tolist())
    return pd.Series(out)


def hash_token(token: str) -> int:
    """FNV-1a 32-bit — stable across processes (unlike Python hash())."""
    h = 0x811C9DC5
    for byte in token.encode("utf-8"):
        h = ((h ^ byte) * 0x01000193) & 0xFFFFFFFF
    return h


def with_bucket(df: DataFrame, id_col, n_buckets: int = 32) -> DataFrame:
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")
    )


def compact_key_col(name_col: str = "name"):
    """JVM-side twin of functions.linking.compact_name_key (the L12
    cross-file key, apps/worker/lib/sql.ts:16-22) — pure string algebra,
    runs inside whole-stage codegen."""
    return F.upper(
        F.regexp_replace(
            F.regexp_replace(F.col(name_col), "&", " AND "), r"[^\p{L}\p{N}]+", ""
        )
    )


def lineage_rows(df: DataFrame, stage: str, wall_seconds: float,
                 snapshot_id: int | None = None) -> DataFrame:
    """Per-partition lineage: computed over the stage output itself."""
    url_col = "url" if "url" in df.columns else None
    agg = [F.count("*").alias("row_count")]
    agg.append(
        (F.countDistinct(url_col) if url_col else F.lit(None).cast("long")).alias(
            "url_count"
        )
    )
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(*agg)
        .select(
            F.lit(stage).alias("stage"),
            "partition_id",
            "row_count",
            "url_count",
            F.lit(round(wall_seconds, 3)).alias("stage_wall_seconds"),
            F.lit(snapshot_id).cast("long").alias("snapshot_id"),
            F.current_timestamp().alias("created_at"),
        )
    )


class StageTimer:
    def __init__(self) -> None:
        self.started = time.time()

    def elapsed(self) -> float:
        return time.time() - self.started


def materialize_nodes(nodes: DataFrame, n_buckets: int = 32) -> DataFrame:
    """entity-hash bucketed; ``compact_key`` is materialized JVM-side so
    name point-lookups are pushed parquet filters with tight row-group
    stats (sorted within partitions), zero Python stages."""
    return (
        with_bucket(
            nodes.withColumn("embedding", embed_text("description"))
            .withColumn("compact_key", compact_key_col("name")),
            "entity_id",
            n_buckets,
        )
        .repartition("bucket")
        .sortWithinPartitions("compact_key")
    )


def materialize_edges(edges: DataFrame, n_buckets: int = 32) -> DataFrame:
    return with_bucket(
        edges.withColumn("embedding", embed_text("description")), "src_id", n_buckets
    ).repartition("bucket")


def materialize_mentions(mentions: DataFrame, n_buckets: int = 32) -> DataFrame:
    # edge mentions have entity_id NULL — bucket by whichever id is set so
    # they hash-distribute instead of piling into a NULL bucket (skew) and
    # edge-mention lookups prune too.
    return with_bucket(
        mentions.withColumn("embedding", embed_text("description")),
        F.coalesce(F.col("entity_id"), F.col("edge_id")),
        n_buckets,
    ).repartition("bucket")
