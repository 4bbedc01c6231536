"""Graph query operators — the read side (SURVEY.md §2.5, Q1-Q10).

All semantics from packages/ai/src/tools/*; rank constants from
tools/lib/search.ts:3-7. Everything is a declarative DataFrame plan:
cosine similarity runs JVM-side (zip_with + aggregate inside whole-stage
codegen); trigram similarity is the one Arrow-vectorized pandas UDF.
Top-k is orderBy().limit() → Spark's TakeOrderedAndProject (no full sort);
keyset cursors become pushed-down predicates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType

from ..operators.materialize import EMBEDDING_DIM, hash_token

# tools/lib/search.ts:3-7
MIN_SEMANTIC_SCORE = 0.02
MIN_KEYWORD_BOOST = 0.08
KEYWORD_WEIGHT = 0.15
EXACT_BOOST = 0.2
PREFIX_BOOST = 0.1

MAX_PATH_DEPTH = 5  # tools/relationship.ts:439


def embed_query(text: str) -> list[float]:
    """Driver-side twin of operators.materialize.embed_text."""
    import numpy as np

    vec = np.zeros(EMBEDDING_DIM, dtype=np.float64)
    for token in (text or "").upper().split():
        h = hash_token(token)
        vec[h % EMBEDDING_DIM] += 1.0 if (h >> 7) % 2 == 0 else -1.0
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return [float(x) for x in vec]


def cosine_to(query_vec: list[float], col: str = "embedding") -> Column:
    """JVM-side cosine similarity against a constant query vector.

    Both sides are L2-normalized, so cosine == dot product:
    aggregate(zip_with(emb, q, (a,b) -> a*b), 0D, (acc,x) -> acc+x).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return F.aggregate(
        F.zip_with(F.col(col).cast("array<double>"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _trigrams(value: str) -> set[str]:
    """pg_trgm-style trigrams: lowercase, pad with 2 leading + 1 trailing
    space per word."""
    out: set[str] = set()
    for word in "".join(
        ch if ch.isalnum() else " " for ch in (value or "").lower()
    ).split():
        padded = f"  {word} "
        for i in range(len(padded) - 2):
            out.add(padded[i : i + 3])
    return out


def make_trigram_udf(term: str):
    return make_multi_trigram_udf([term])


def make_multi_trigram_udf(terms: list[str]):
    """max over search terms of pg_trgm-style similarity(value, term) —
    the multi-term keyword boost (entity.ts:42-44, relationship.ts:35-43),
    one Arrow-vectorized UDF for the whole term list."""
    term_grams = [g for g in (_trigrams(t) for t in terms) if g]

    @F.pandas_udf(DoubleType())
    def trigram_sim(values: pd.Series) -> pd.Series:
        def sim(v):
            grams = _trigrams(v or "")
            if not grams:
                return 0.0
            best = 0.0
            for tg in term_grams:
                union = len(grams | tg)
                if union:
                    s = len(grams & tg) / union
                    if s > best:
                        best = s
            return best

        return values.map(sim)

    return trigram_sim


def unique_terms(values: list[str]) -> list[str]:
    """search.ts:14-16 — trimmed, deduped, order-preserving."""
    out: list[str] = []
    seen: set[str] = set()
    for value in values:
        term = (value or "").strip()
        if term and term not in seen:
            seen.add(term)
            out.append(term)
    return out


def _exact_boost(terms: list[str], name_col: str) -> Column:
    """entity.ts:46-57 — greatest over terms of (EXACT on lower-equal,
    PREFIX on case-insensitive prefix)."""
    cases = []
    for term in terms:
        lt = term.lower()
        cases.append(
            F.when(F.lower(F.col(name_col)) == lt, F.lit(EXACT_BOOST))
            .when(F.lower(F.col(name_col)).startswith(lt), F.lit(PREFIX_BOOST))
            .otherwise(F.lit(0.0))
        )
    return F.greatest(*cases) if len(cases) > 1 else cases[0]


def _rel_exact_boost(terms: list[str], src_col: str, dst_col: str) -> Column:
    """relationship.ts:45-58 — per-term CASE over both endpoint names
    (exact on either beats prefix on either)."""
    src = F.lower(F.coalesce(F.col(src_col), F.lit("")))
    dst = F.lower(F.coalesce(F.col(dst_col), F.lit("")))
    cases = []
    for term in terms:
        lt = term.lower()
        cases.append(
            F.when(src == lt, F.lit(EXACT_BOOST))
            .when(dst == lt, F.lit(EXACT_BOOST))
            .when(src.startswith(lt), F.lit(PREFIX_BOOST))
            .when(dst.startswith(lt), F.lit(PREFIX_BOOST))
            .otherwise(F.lit(0.0))
        )
    return F.greatest(*cases) if len(cases) > 1 else cases[0]


def hybrid_score(
    query_text: str, text_col: str = "name", emb_col: str = "embedding"
) -> Column:
    """entity.ts:135-136 — semantic + weighted trigram + exact/prefix boosts."""
    qvec = embed_query(query_text)
    sem = F.greatest(F.lit(0.0), cosine_to(qvec, emb_col))
    trg = make_trigram_udf(query_text)(F.col(text_col))
    lower_q = query_text.lower()
    exact = F.when(F.lower(F.col(text_col)) == lower_q, EXACT_BOOST).otherwise(0.0)
    prefix = F.when(
        (F.lower(F.col(text_col)) != lower_q)
        & F.lower(F.col(text_col)).startswith(lower_q),
        PREFIX_BOOST,
    ).otherwise(0.0)
    return sem + F.lit(KEYWORD_WEIGHT) * trg + exact + prefix


def _keyset(df: DataFrame, cursor: tuple | None, score_col: str, id_col: str) -> DataFrame:
    """Keyset pagination (tools/lib/search.ts:25-51): strictly after
    (score DESC, id ASC)."""
    if cursor is None:
        return df
    score, last_id = cursor
    return df.where(
        (F.col(score_col) < score)
        | ((F.col(score_col) == score) & (F.col(id_col) > last_id))
    )


# --------------------------------------------------------------------------
# Q1 list_files — tools/file.ts:19-81
# --------------------------------------------------------------------------

def list_files(pages: DataFrame, name_filter: str | None = None, limit: int = 20,
               cursor: str | None = None) -> DataFrame:
    df = pages.select("url", "warc_ts", "lang")
    if name_filter:
        df = df.where(F.lower(F.col("url")).contains(name_filter.lower()))
    if cursor:
        df = df.where(F.col("url") > cursor)
    return df.orderBy("url").limit(limit)


# --------------------------------------------------------------------------
# Q2/Q3 entity search / list — tools/entity.ts:104-274
# --------------------------------------------------------------------------

def search_entities(nodes: DataFrame, query_text: str, limit: int = 10,
                    cursor: tuple | None = None,
                    urls: list[str] | None = None,
                    mentions: DataFrame | None = None,
                    keywords: list[str] | None = None) -> DataFrame:
    """entity.ts:104-200 — semantic primary, multi-term keyword + exact/
    prefix boosts: terms = uniqueTerms(keywords + query); semantic embeds
    the query text only; keyword boost = max trigram similarity over terms;
    recall filter = semantic≥0.02 OR raw keyword≥0.08 OR exact>0."""
    if urls and mentions is not None:
        # optional file scope via EXISTS over sources (entity.ts:64-76)
        scoped = mentions.where(F.col("url").isin(urls)).select("entity_id").distinct()
        nodes = nodes.join(scoped, "entity_id", "left_semi")
    terms = unique_terms([*(keywords or []), query_text])
    sem = F.greatest(F.lit(0.0), cosine_to(embed_query(query_text), "embedding"))
    kw = make_multi_trigram_udf(terms)(F.col("name"))
    exact = _exact_boost(terms, "name")
    ranked = (
        nodes.withColumn("_sem", sem)
        .withColumn("_kw", kw)
        .withColumn("_exact", exact)
        .withColumn(
            "score",
            F.col("_sem") + F.lit(KEYWORD_WEIGHT) * F.col("_kw") + F.col("_exact"),
        )
    )
    filtered = ranked.where(
        (F.col("_sem") >= MIN_SEMANTIC_SCORE)
        | (F.col("_kw") >= MIN_KEYWORD_BOOST)
        | (F.col("_exact") > 0)
    ).drop("_sem", "_kw", "_exact")
    filtered = _keyset(filtered, cursor, "score", "entity_id")
    return (
        filtered.select("entity_id", "name", "type", "description", "n_sources", "score")
        .orderBy(F.desc("score"), F.asc("entity_id"))
        .limit(limit)
    )


def list_entities(nodes: DataFrame, limit: int = 50, cursor: str | None = None,
                  urls: list[str] | None = None, mentions: DataFrame | None = None,
                  units: DataFrame | None = None) -> DataFrame:
    df = nodes
    if urls and mentions is not None:
        scoped = mentions.where(F.col("url").isin(urls)).select("entity_id").distinct()
        df = df.join(scoped, "entity_id", "left_semi")  # EXISTS semi-join
    if cursor:
        df = df.where(F.col("entity_id") > cursor)
    return (
        df.select("entity_id", "name", "type", "description", "n_sources")
        .orderBy("entity_id")
        .limit(limit)
    )


def lookup_entity(nodes: DataFrame, name: str) -> DataFrame:
    """Exact lookup by compact name key — Python-free point lookup.

    Uses the materialized ``compact_key`` column when present (pushed
    parquet filter + tight row-group stats from sortWithinPartitions);
    falls back to the equivalent JVM regexp expression otherwise. The
    query constant is normalized driver-side with the Python twin.
    """
    from ..functions.linking import compact_name_key
    from ..operators.materialize import compact_key_col

    key = compact_name_key(name)
    col = (
        F.col("compact_key")
        if "compact_key" in nodes.columns
        else compact_key_col("name")
    )
    return nodes.where(col == key)


# --------------------------------------------------------------------------
# Q4/Q5 relationship search / get — tools/relationship.ts:128-319
# --------------------------------------------------------------------------

def _edges_with_names(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    src = nodes.select(
        F.col("entity_id").alias("src_id"), F.col("name").alias("src_name")
    )
    dst = nodes.select(
        F.col("entity_id").alias("dst_id"), F.col("name").alias("dst_name")
    )
    return edges.join(src, "src_id", "left").join(dst, "dst_id", "left")


def search_relationships(edges: DataFrame, nodes: DataFrame, query_text: str,
                         limit: int = 10, cursor: tuple | None = None,
                         keywords: list[str] | None = None) -> DataFrame:
    """relationship.ts:35-232 — keyword boost = max trigram similarity over
    terms × (description, src name, dst name); exact boost = per-term CASE
    over endpoint names; filter semantic≥0.02 OR keyword≥0.08 OR exact>0."""
    df = _edges_with_names(edges, nodes)
    terms = unique_terms([*(keywords or []), query_text])
    trg = make_multi_trigram_udf(terms)
    combined_kw = F.greatest(
        trg(F.col("description")),
        trg(F.coalesce(F.col("src_name"), F.lit(""))),
        trg(F.coalesce(F.col("dst_name"), F.lit(""))),
    )
    sem = F.greatest(F.lit(0.0), cosine_to(embed_query(query_text), "embedding"))
    df = (
        df.withColumn("_sem", sem)
        .withColumn("_kw", combined_kw)
        .withColumn("_exact", _rel_exact_boost(terms, "src_name", "dst_name"))
        .withColumn(
            "score",
            F.col("_sem") + F.lit(KEYWORD_WEIGHT) * F.col("_kw") + F.col("_exact"),
        )
    )
    df = df.where(
        (F.col("_sem") >= MIN_SEMANTIC_SCORE)
        | (F.col("_kw") >= MIN_KEYWORD_BOOST)
        | (F.col("_exact") > 0)
    ).drop("_sem", "_kw", "_exact")
    df = _keyset(df, cursor, "score", "edge_id")
    return (
        df.select(
            "edge_id", "src_id", "src_name", "dst_id", "dst_name", "pred",
            "description", "strength", "score",
        )
        .orderBy(F.desc("score"), F.asc("edge_id"))
        .limit(limit)
    )


def get_relationships(edges: DataFrame, nodes: DataFrame, entity_ids: list[str],
                      limit: int = 50, cursor: str | None = None) -> DataFrame:
    df = edges.where(
        F.col("src_id").isin(entity_ids) | F.col("dst_id").isin(entity_ids)
    )
    if cursor:
        df = df.where(F.col("edge_id") > cursor)
    return (
        _edges_with_names(df, nodes)
        .select("edge_id", "src_id", "src_name", "dst_id", "dst_name", "pred",
                "description", "strength", "n_sources")
        .orderBy("edge_id")
        .limit(limit)
    )


# --------------------------------------------------------------------------
# Q6 neighbours — tools/relationship.ts:327-398
# --------------------------------------------------------------------------

def get_entity_neighbours(edges: DataFrame, nodes: DataFrame, entity_id: str,
                          limit: int = 50) -> DataFrame:
    touching = edges.where(
        (F.col("src_id") == entity_id) | (F.col("dst_id") == entity_id)
    )
    nbr = touching.select(
        F.when(F.col("src_id") == entity_id, F.col("dst_id"))
        .otherwise(F.col("src_id"))
        .alias("entity_id"),
        "edge_id",
        "pred",
        "strength",
    )
    return (
        nbr.join(nodes.select("entity_id", "name", "type", "description"), "entity_id")
        .orderBy("entity_id")
        .limit(limit)
    )


# --------------------------------------------------------------------------
# Q7 shortest path — tools/relationship.ts:405-549 (BFS ≤5 hops, undirected)
# --------------------------------------------------------------------------

def get_path_between_entities(edges: DataFrame, src_id: str, dst_id: str,
                              max_depth: int = MAX_PATH_DEPTH) -> list[str] | None:
    """Iterative frontier BFS over edge DataFrames (reference semantics:
    tools/relationship.ts:405-549, ≤5 hops, undirected).

    Scale-safe: the per-level predecessor maps stay as checkpointed
    DataFrames — the driver never materializes a frontier. Each level probes
    dst with a single-row take(1); the ≤max_depth path is reconstructed with
    one single-row pushed-filter lookup per level.
    """
    if src_id == dst_id:
        return [src_id]
    bidir = edges.select(
        F.col("src_id").alias("u"), F.col("dst_id").alias("v")
    ).union(edges.select(F.col("dst_id").alias("u"), F.col("src_id").alias("v")))

    spark = edges.sparkSession
    visited = spark.createDataFrame([(src_id,)], ["node"])
    frontier = visited
    levels: list[DataFrame] = []
    found = False

    for _ in range(max_depth):
        step = (
            bidir.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), F.col("u").alias("pred"))
            .join(visited, "node", "left_anti")
            .groupBy("node")
            .agg(F.min("pred").alias("pred"))
            .localCheckpoint(eager=True)
        )
        if not step.take(1):
            return None
        levels.append(step)
        if step.where(F.col("node") == dst_id).take(1):
            found = True
            break
        frontier = step.select("node")
        visited = visited.union(frontier).distinct().localCheckpoint(eager=True)
    if not found:
        return None

    # Walk back one level per hop: dst is in levels[-1], its pred in
    # levels[-2], …, the level-0 pred is src. Each lookup is a single-row
    # equality filter on a checkpointed frontier — no full collect.
    path = [dst_id]
    cur = dst_id
    for level in reversed(levels):
        row = level.where(F.col("node") == cur).select("pred").take(1)
        if not row or row[0]["pred"] is None:
            break
        cur = row[0]["pred"]
        path.append(cur)
    return list(reversed(path))


# --------------------------------------------------------------------------
# Q8 sources — tools/source.ts:254-422
# --------------------------------------------------------------------------

def get_entity_sources(mentions: DataFrame, units: DataFrame, entity_ids: list[str],
                       query_text: str | None = None, limit: int = 20) -> DataFrame:
    df = mentions.where(F.col("entity_id").isin(entity_ids))
    df = df.join(
        units.select("unit_id", F.col("content").alias("unit_content")),
        "unit_id",
        "left",
    )
    if query_text:
        score = hybrid_score(query_text, "description", "embedding")
        return (
            df.withColumn("score", score)
            .select("mention_id", "entity_id", "unit_id", "url", "description",
                    "source_chunk_ids", "score")
            .orderBy(F.desc("score"), F.asc("mention_id"))
            .limit(limit)
        )
    return (
        df.select("mention_id", "entity_id", "unit_id", "url", "description",
                  "source_chunk_ids")
        .orderBy("mention_id")
        .limit(limit)
    )


def get_relationship_sources(mentions: DataFrame, units: DataFrame,
                             edge_ids: list[str], limit: int = 20) -> DataFrame:
    return (
        mentions.where(F.col("edge_id").isin(edge_ids))
        .join(units.select("unit_id"), "unit_id", "left")
        .select("mention_id", "edge_id", "unit_id", "url", "description",
                "source_chunk_ids")
        .orderBy("mention_id")
        .limit(limit)
    )


# --------------------------------------------------------------------------
# Q9 similar sources — tools/source.ts:450-554 (kNN cosine, 3× over-fetch)
# --------------------------------------------------------------------------

def similar_sources(mentions: DataFrame, seed_mention_id: str, k: int = 5,
                    exclude: list[str] | None = None) -> DataFrame:
    seed = mentions.where(F.col("mention_id") == seed_mention_id).select(
        "embedding"
    ).first()
    if seed is None:
        return mentions.sparkSession.createDataFrame(
            [], "mention_id string, url string, description string, distance double"
        )
    qvec = [float(x) for x in seed["embedding"]]
    # Exclusion is applied BEFORE the top-k (the reference over-fetches 3×
    # then drops seen ids, source.ts:487 — pre-filtering is equivalent and
    # never returns <k rows when k matches exist).
    df = mentions.where(F.col("mention_id") != seed_mention_id)
    if exclude:
        df = df.where(~F.col("mention_id").isin(exclude))
    return (
        df.withColumn("distance", F.lit(1.0) - cosine_to(qvec, "embedding"))
        .select("mention_id", "url", "description", "distance")
        .orderBy(F.asc("distance"), F.asc("mention_id"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Q10 source file metadata — tools/source.ts:650-716
# --------------------------------------------------------------------------

def get_source_file_metadata(mentions: DataFrame, pages_or_text: DataFrame,
                             mention_ids: list[str]) -> DataFrame:
    return (
        mentions.where(F.col("mention_id").isin(mention_ids))
        .select("mention_id", "url")
        .join(pages_or_text.select("url", "warc_ts", "lang"), "url", "left")
        .orderBy("mention_id")
    )
