"""The pipeline DAG driver: pages → text → units → raw_graph → nodes/edges/
mentions, with per-stage snapshot checkpoints and resume.

Stage list mirrors the reference's process-step state machine
(packages/db/src/tables/graph.ts:27-38: preprocessing → chunking →
extracting → deduplicating → saving), one Iceberg-shaped snapshot per stage
(sources.catalog). ``run(resume=True)`` skips any stage whose table is
already committed — restart-from-checkpoint per BASELINE.md.

Shuffle budget of a full run (the 100 TB story):
  extract_text   0 shuffles (mapInPandas over the scan)
  units          0 shuffles (same)
  raw_graph      0 shuffles (per-url kernel; nested row per url)
  link           the only shuffles: key-bucket anchor aggs + CC iterations
                 (each a groupBy on entity ids; salted two-phase for skew)
  canonicalize   joins on entity_id/edge_id + one groupBy per output table
  materialize    repartition by bucket (write clustering)
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.build_graph import (
    explode_graph,
    explode_units,
    graph_rows_df,
    with_doc_view_buckets,
)
from .operators.extract_text import extract_text
from .operators.link import canonicalize, entity_id_map
from .operators.materialize import (
    lineage_rows,
    materialize_edges,
    materialize_mentions,
    materialize_nodes,
)
from .sources.catalog import Catalog

STAGES = ["text", "raw_graph", "views", "id_map", "graph", "lineage"]


def _single_writer(fn):
    """Serialize mutating entrypoints per warehouse (Catalog.mutation_lock).
    The wrapper binds arguments through the wrapped signature so callers
    may pass the data/warehouse parameters positionally OR by their
    documented keyword names."""
    import functools
    import inspect

    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        with Catalog(bound.arguments["warehouse"]).mutation_lock():
            return fn(*args, **kwargs)

    return wrapper


def _parallel_commits(cat: Catalog, jobs: list[tuple]) -> None:
    """Commit independent tables concurrently. Safe because manifests are
    per-table (atomic os.replace flip each); Spark schedules the concurrent
    write jobs across idle task slots, overlapping the per-job fixed
    latency that otherwise serializes (the dominant cost of the views and
    graph stages at high core counts). A job tuple is
    (df, table, stage[, commit-kwargs])."""
    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        futures = [
            pool.submit(
                cat.commit, job[0], job[1], stage=job[2],
                **(job[3] if len(job) > 3 else {}),
            )
            for job in jobs
        ]
        for future in futures:
            future.result()


from .plans.search_index import SEARCH_INDEX_TABLES  # single source of truth


def _commit_search_index(cat: Catalog, spark: SparkSession) -> None:
    """Build + commit the ranked-search index tables over the current
    canonical graph (plans.search_index — the GIN/DiskANN analog)."""
    from .plans.search_index import (
        build_entity_search_index,
        build_relationship_search_index,
        centroid_rows,
        record_ivf_training,
    )

    nodes_m = cat.read(spark, "nodes")
    edges_m = cat.read(spark, "edges")
    e_post, e_asg, e_cents = build_entity_search_index(nodes_m)
    r_post, r_asg, r_cents = build_relationship_search_index(edges_m, nodes_m)
    cents = centroid_rows(spark, "entity", e_cents).unionByName(
        centroid_rows(spark, "edge", r_cents)
    )
    _parallel_commits(
        cat,
        [
            (e_post, "entity_trigrams", "indexing"),
            (e_asg, "entity_ivf", "indexing"),
            (r_post, "edge_trigrams", "indexing"),
            (r_asg, "edge_ivf", "indexing"),
            (cents, "ivf_centroids", "indexing"),
        ],
    )
    # reference point for the centroid-drift trigger (maybe_retrain_ivf)
    record_ivf_training(cat, nodes_m.count(), edges_m.count())


@dataclass
class PipelineResult:
    warehouse: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    timings: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)


@_single_writer
def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    link_mode: str = "parity",
    n_buckets: int = 32,
    resume: bool = False,
    collect_lineage: bool = True,
    build_search_index: bool = False,
) -> PipelineResult:
    cat = Catalog(warehouse)
    result = PipelineResult(warehouse=warehouse)
    lineage_batches: list[DataFrame] = []

    def stage(name: str, build, committed_tables: list[str]):
        if resume and all(cat.exists(t) for t in committed_tables):
            result.stages_skipped.append(name)
            return
        started = time.time()
        build()
        wall = time.time() - started
        result.timings[name] = round(wall, 3)
        result.stages_run.append(name)

    # 1. text
    stage("text", lambda: cat.commit(extract_text(pages), "text", stage="preprocessing"), ["text"])
    text_df = cat.read(spark, "text").where(F.col("error_code").isNull())

    # 2+3. per-document kernel: units + extraction + within-doc dedupe in ONE
    # pass over text (chunking and extracting steps of the reference run
    # back-to-back per file; fusing avoids re-chunking the corpus)
    stage(
        "raw_graph",
        lambda: cat.commit(graph_rows_df(text_df), "raw_graph", stage="extracting"),
        ["raw_graph"],
    )
    raw_graph = cat.read(spark, "raw_graph")

    # flat views of the nested checkpoint, materialized ONCE (column-pruned
    # explodes); every downstream stage reads these small flat tables
    # instead of re-scanning the heavy nested table
    def _views():
        # property BEFORE the commits: a crash after all four views are
        # committed but before the property write would otherwise leave a
        # resume=True warehouse whose manifests declare the layout while
        # incremental batches (gated on the property) never add the bucket
        # columns — failing every later append
        cat.set_property("doc_view_buckets", n_buckets)
        n, e, m = with_doc_view_buckets(*explode_graph(raw_graph), n_buckets)
        _parallel_commits(
            cat,
            [
                (explode_units(raw_graph.select("units")), "units", "chunking"),
                (n, "nodes_doc", "extracting", {"partition_by": ["eb"]}),
                (
                    e, "edges_doc", "extracting",
                    {"partition_by": ["sb"], "sort_within": ["db"]},
                ),
                (m, "mentions_doc", "extracting", {"partition_by": ["mb"]}),
            ],
        )

    stage("views", _views, ["units", "nodes_doc", "edges_doc", "mentions_doc"])

    nodes_doc = cat.read(spark, "nodes_doc")
    edges_doc = cat.read(spark, "edges_doc")
    mentions_doc = cat.read(spark, "mentions_doc")

    # 4. cross-document linking (blocking + connected components).
    # link_keys is the persisted linking-key index (the reference's
    # Postgres expression index, sql.ts:16-22) — incremental_add
    # semi-joins it to find the touched set in O(new + touched)
    # (operators.delta_link).
    def _id_map():
        from .operators.delta_link import link_keys_df

        _parallel_commits(
            cat,
            [
                (entity_id_map(nodes_doc, mode=link_mode), "id_map", "deduplicating"),
                (link_keys_df(nodes_doc, link_mode), "link_keys", "deduplicating"),
            ],
        )
        # record the key family the persisted link_keys/id_map were built
        # with — incremental batches validate against it (a mismatched
        # --link-mode would compute the touched set from the wrong keys)
        cat.set_property("link_mode", link_mode)

    stage("id_map", _id_map, ["id_map", "link_keys"])
    id_map = cat.read(spark, "id_map")

    # 5. canonical graph + materialize
    def _graph():
        nodes, edges, mentions = canonicalize(nodes_doc, edges_doc, mentions_doc, id_map)
        _parallel_commits(
            cat,
            [
                (materialize_nodes(nodes, n_buckets), "nodes", "saving"),
                (materialize_edges(edges, n_buckets), "edges", "saving"),
                (materialize_mentions(mentions, n_buckets), "mentions", "saving"),
            ],
        )

    stage("graph", _graph, ["nodes", "edges", "mentions"])

    # 5b. (opt-in) ranked-search index: trigram posting tables + IVF cells —
    # the GIN/DiskANN analog (plans.search_index, VERDICT r3 #4)
    if build_search_index:
        stage(
            "search_index",
            lambda: _commit_search_index(cat, spark),
            SEARCH_INDEX_TABLES,
        )

    # 6. lineage/metrics
    if collect_lineage:
        def _lineage():
            batches = lineage_batches or []
            stage_of = {"text": "text", "nodes": "graph", "edges": "graph", "mentions": "graph"}
            for table in ("text", "nodes", "edges", "mentions"):
                snap = cat.current_snapshot(table)
                batches.append(
                    lineage_rows(
                        cat.read(spark, table),
                        table,
                        result.timings.get(stage_of[table], 0.0),
                        snapshot_id=snap["id"] if snap else None,
                    )
                )
            df = batches[0]
            for extra in batches[1:]:
                df = df.unionByName(extra)
            cat.commit(df, "lineage", stage="metrics")

        stage("lineage", _lineage, ["lineage"])

    for table in ("nodes", "edges", "mentions"):
        if cat.exists(table):
            result.counts[table] = cat.read(spark, table).count()
    return result


APPEND_COMPACT_AFTER = 16  # fast-append dirs per doc view before rewrite


def _check_link_mode(cat: Catalog, link_mode: str) -> None:
    """Delta correctness requires every incremental batch to use the key
    family the warehouse's link_keys/id_map were built with (ADVICE r5):
    raise on mismatch, backfill the property for pre-round-6 warehouses."""
    stored = cat.get_property("link_mode")
    if stored is None:
        if cat.exists("link_keys"):
            cat.set_property("link_mode", link_mode)
        return
    if stored != link_mode:
        raise ValueError(
            f"warehouse was linked with link_mode={stored!r}; an incremental "
            f"batch with link_mode={link_mode!r} would compute the touched "
            "set from a mismatched key family and corrupt the graph"
        )


@_single_writer
def incremental_add(
    spark: SparkSession,
    new_pages: DataFrame,
    warehouse: str,
    link_mode: str = "parity",
    n_buckets: int = 32,
    compact_appends_after: int = APPEND_COMPACT_AFTER,
    check_conflicts: bool = True,
) -> PipelineResult:
    """Incremental ingestion — the reference's operating mode (new files
    arrive, process-file.ts runs per file, then the SQL cross-file dedupe
    folds them into the existing graph).

    Spark restatement: the document-sharded stages run ONLY on the new
    pages and fast-append to the text/raw_graph/views tables (no rewrite of
    existing data); the cross-document linking + canonical graph are then
    rebuilt over the appended doc-level views. Relinking is a global pass —
    exactly the L12 semantics — and its input (nodes_doc) is ~2 rows per
    thousand input bytes, so the relink cost is negligible next to
    ingestion. Deterministic: the result equals a from-scratch run over the
    union of all pages (tested).

    Crash-safe: every fast-append is tagged with a deterministic batch id
    (order-insensitive xxhash64-xor over the batch's urls). A retried call
    after a mid-batch crash finds the tag in the manifest chain and skips
    already-appended tables instead of duplicating rows (tested)."""
    cat = Catalog(warehouse)
    result = PipelineResult(warehouse=warehouse)
    _check_link_mode(cat, link_mode)

    # deterministic idempotency key: one tiny distributed agg, one driver
    # row. The key hashes CONTENT as well as urls — a re-submission of the
    # same urls with changed html must NOT look like a retry (it would be
    # silently skipped and the new content lost); instead it gets a fresh
    # id and the url-conflict guard below rejects it with a pointer to
    # incremental_update. The key also carries the warehouse's
    # removal_epoch so RE-ADDING a previously removed url is a fresh
    # batch (its rows must append after the removal's equality deletes).
    sig = new_pages.agg(
        F.bit_xor(F.xxhash64("url")).alias("h"),
        F.bit_xor(F.xxhash64("url", "html")).alias("c"),
        F.count("*").alias("n"),
    ).first()
    epoch = int(cat.get_property("removal_epoch", 0))
    base_id = f"b{(sig['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}-{sig['n']}"
    content = f"{(sig['c'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
    batch_id = f"{base_id}x{content}-e{epoch}"
    if epoch == 0 and cat.batch_appended("text", base_id):
        # pre-round-6 warehouses tagged batches WITHOUT the epoch/content
        # suffix; a retry of such a batch must keep its original id or
        # every idempotency check would miss and double-append its rows
        batch_id = base_id

    def _append(df_builder, table: str, stage: str):
        if cat.batch_appended(table, batch_id):
            result.stages_skipped.append(f"{table}_append")
            return
        cat.commit(df_builder(), table, stage=stage, append=True, batch_id=batch_id)

    # url-conflict guard: adding a url the warehouse already holds would
    # silently duplicate its doc rows (the reference's file ids are
    # unique; a changed file goes through delete + re-process). Skipped
    # when THIS batch's text rows are already appended — a retry's own
    # urls are legitimately present. Cost: one COLUMN-PRUNED url
    # semi-join over the text table (broadcast batch side, no shuffle) —
    # the same narrow-scan class as the delta path's documented
    # O(warehouse) filter terms; an Iceberg deployment would serve it
    # from per-file url bloom filters. Producers that guarantee disjoint
    # arrivals (e.g. stream_ingest after its own conflict split) pass
    # check_conflicts=False to skip it.
    if check_conflicts and cat.exists("text") and not cat.batch_appended(
        "text", batch_id
    ):
        n_dup = (
            cat.read(spark, "text")
            .join(new_pages.select("url").distinct(), "url", "leftsemi")
            .count()
        )
        if n_dup:
            raise ValueError(
                f"{n_dup} of the batch's urls already exist in the "
                "warehouse; use incremental_update to replace documents "
                "(or incremental_remove first)"
            )

    started = time.time()
    _append(lambda: extract_text(new_pages), "text", "preprocessing")
    result.timings["text_append"] = round(time.time() - started, 3)

    # process only the new urls through the kernel (read back from the
    # batch's own snapshot dir — no semi-join over the whole text table)
    text_new = spark.read.parquet(*cat.batch_paths("text", batch_id)).where(
        F.col("error_code").isNull()
    )
    started = time.time()
    _append(lambda: graph_rows_df(text_new), "raw_graph", "extracting")
    raw_new = spark.read.parquet(*cat.batch_paths("raw_graph", batch_id))
    _append(lambda: explode_units(raw_new.select("units")), "units", "chunking")
    n, e, m = explode_graph(raw_new)
    # match the views' bucketed layout (absent on pre-round-6 warehouses);
    # the catalog re-applies the stored partition spec on every append
    view_buckets = cat.get_property("doc_view_buckets")
    if view_buckets:
        n, e, m = with_doc_view_buckets(n, e, m, int(view_buckets))
    _append(lambda: n, "nodes_doc", "extracting")
    _append(lambda: e, "edges_doc", "extracting")
    _append(lambda: m, "mentions_doc", "extracting")
    result.timings["ingest_append"] = round(time.time() - started, 3)

    # relink: DELTA pass when the link_keys index exists (O(new + touched),
    # operators.delta_link — VERDICT r4 #1/#2), else the legacy global L12
    # pass (pre-round-5 warehouse), bootstrapping link_keys for next time.
    started = time.time()
    if cat.exists("link_keys"):
        from .operators.delta_link import delta_relink

        stats = delta_relink(
            spark, cat, batch_id, link_mode=link_mode, n_buckets=n_buckets
        )
        result.timings["relink"] = round(time.time() - started, 3)
        result.timings.update(
            {f"relink_{k}": v for k, v in stats.timings.items()}
        )
        result.counts["touched_entities"] = stats.n_touched_entities
        result.counts["touched_doc_edges"] = stats.n_touched_doc_edges
        result.stages_run = ["text_append", "ingest_append", "delta_relink"]
        if "search_index" in stats.timings:
            result.stages_run.append("search_index")
    else:
        nodes_doc = cat.read(spark, "nodes_doc")
        edges_doc = cat.read(spark, "edges_doc")
        mentions_doc = cat.read(spark, "mentions_doc")
        from .operators.delta_link import link_keys_df

        _parallel_commits(
            cat,
            [
                (entity_id_map(nodes_doc, mode=link_mode), "id_map", "deduplicating"),
                (link_keys_df(nodes_doc, link_mode), "link_keys", "deduplicating"),
            ],
        )
        cat.set_property("link_mode", link_mode)
        id_map = cat.read(spark, "id_map")
        nodes, edges, mentions = canonicalize(nodes_doc, edges_doc, mentions_doc, id_map)
        _parallel_commits(
            cat,
            [
                (materialize_nodes(nodes, n_buckets), "nodes", "saving"),
                (materialize_edges(edges, n_buckets), "edges", "saving"),
                (materialize_mentions(mentions, n_buckets), "mentions", "saving"),
            ],
        )
        result.timings["relink"] = round(time.time() - started, 3)
        result.stages_run = ["text_append", "ingest_append", "relink"]

        # legacy path: the canonical graph changed — rebuild the search
        # index wholesale when present, INCLUDING a partial index left by
        # a crash during the five-table commit (ADVICE r5: gating on one
        # table would FileNotFoundError on the missing siblings)
        if any(cat.exists(t) for t in SEARCH_INDEX_TABLES):
            started = time.time()
            _commit_search_index(cat, spark)
            result.timings["search_index"] = round(time.time() - started, 3)
            result.stages_run.append("search_index")

    _auto_compact(spark, cat, result, compact_appends_after)

    for table in ("nodes", "edges", "mentions"):
        result.counts[table] = cat.read(spark, table).count()
    _maybe_retrain_ivf(spark, cat, result)
    return result


def _maybe_retrain_ivf(spark, cat: Catalog, result: PipelineResult) -> None:
    """Centroid-drift check (VERDICT r5 watch #1) — free: live IVF rows
    equal the canonical nodes/edges counts the batch just computed."""
    from .plans.search_index import has_search_index, maybe_retrain_ivf

    if not has_search_index(cat):
        return
    retrained = maybe_retrain_ivf(
        spark, cat,
        live_counts={"entity": result.counts.get("nodes", 0),
                     "edge": result.counts.get("edges", 0)},
    )
    if retrained:
        result.counts["ivf_retrained"] = retrained


def incremental_update(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    link_mode: str = "parity",
    n_buckets: int = 32,
    compact_appends_after: int = APPEND_COMPACT_AFTER,
) -> PipelineResult:
    """Replace documents in place — the reference's re-upload flow (a
    changed file is delete-file'd then re-processed; there is no in-place
    mutation in the reference either). Composition of
    ``incremental_remove(urls)`` + ``incremental_add(pages)``, executed
    under ONE mutation lock so no other writer can slip between the legs
    (a concurrent add of the same urls in that gap would strand the
    documents removed-but-not-readded until a retry).

    Crash recovery: re-run the update. A crash after the remove leg
    re-executes the removal as a FRESH batch (the completed leg bumped
    the epoch) — it finds the urls already masked, touches nothing, and
    the add leg proceeds; a crash inside either leg replays that leg
    idempotently by its batch id. Either way the retry converges to the
    same end state: ≡ a from-scratch build where these urls carry the
    new content (tested)."""
    with Catalog(warehouse).mutation_lock():
        result = incremental_remove.__wrapped__(
            spark, pages.select("url"), warehouse, link_mode=link_mode,
            n_buckets=n_buckets, compact_appends_after=compact_appends_after,
        )
        add = incremental_add.__wrapped__(
            spark, pages, warehouse, link_mode=link_mode, n_buckets=n_buckets,
            compact_appends_after=compact_appends_after,
        )
    result.stages_run += add.stages_run
    result.stages_skipped += add.stages_skipped
    result.timings.update(
        {f"add_{k}" if k in result.timings else k: v
         for k, v in add.timings.items()}
    )
    result.counts.update(add.counts)
    return result


# tables whose append/delete chains the per-batch compaction bounds
_COMPACTABLE_TABLES = (
    "text", "raw_graph", "units", "nodes_doc", "edges_doc",
    "mentions_doc", "link_keys",
    # MOR graph tables: compaction also drains their delete
    # chains and restores bucket clustering
    "id_map", "nodes", "edges", "mentions",
)


def _auto_compact(spark, cat: Catalog, result: PipelineResult,
                  compact_appends_after: int) -> None:
    """Small-files + delete-chain control (the 100 TB concern with
    per-batch fast-appends): once a table's snapshot references
    compact_appends_after data dirs, rewrite it as one clean snapshot —
    Iceberg's rewrite-data-files action, amortized to 1/N of batches.
    Compaction carries batch-id provenance forward, so retried batches
    still skip."""
    if not compact_appends_after:
        return
    started = time.time()
    compacted = []
    for table in _COMPACTABLE_TABLES:
        snap = cat.current_snapshot(table) if cat.exists(table) else None
        chain = len(snap.get("dirs") or []) if snap else 0
        deletes = len(snap.get("deletes") or []) if snap else 0
        if max(chain, deletes) >= compact_appends_after:
            cat.compact(spark, table)
            compacted.append(table)
    if compacted:
        result.timings["compact"] = round(time.time() - started, 3)
        result.counts["compacted_tables"] = len(compacted)
        result.stages_run.append("compact")


@_single_writer
def incremental_remove(
    spark: SparkSession,
    urls,
    warehouse: str,
    link_mode: str = "parity",
    n_buckets: int = 32,
    compact_appends_after: int = APPEND_COMPACT_AFTER,
) -> PipelineResult:
    """Remove documents from an existing warehouse — the reference's
    delete-file workflow (apps/worker/workflows/delete-file.ts:34-100,
    bulk form delete-graph-files.ts), on the delta closure machinery:
    O(removed + touched) per batch, result ≡ a from-scratch build over the
    complement corpus in both link modes (operators.delta_remove).

    ``urls`` is a DataFrame with a ``url`` column or a list of url
    strings. Urls absent from the warehouse are ignored (the reference
    returns early on an unknown fileId, delete-file.ts:30-32).

    Crash-safe and retry-idempotent: the removal's decision sets are the
    FIRST commit (tagged with the batch id) and every table mutation is
    guarded by the same tag. Mutating calls (add/remove) must be issued
    serially per warehouse and a crashed batch retried before the next
    mutation — the single-writer discipline Iceberg expects; the
    ``removal_epoch`` property fences add-batch idempotency keys across
    removals so a removed url can be re-ingested."""
    cat = Catalog(warehouse)
    result = PipelineResult(warehouse=warehouse)
    _check_link_mode(cat, link_mode)

    if not isinstance(urls, DataFrame):
        urls = spark.createDataFrame([(u,) for u in urls], "url string")

    sig = urls.agg(
        F.bit_xor(F.xxhash64("url")).alias("h"), F.count("*").alias("n")
    ).first()
    epoch = int(cat.get_property("removal_epoch", 0))
    batch_id = (
        f"rm{(sig['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}-{sig['n']}-e{epoch}"
    )

    from .operators.delta_remove import delta_unlink

    # strict retry idempotency (VERDICT r6 wrong #3): when none of the urls
    # are live AND no partial commits of this batch exist (i.e. this is a
    # repeat of an already-completed removal, or a ghost batch), the whole
    # call is a no-op — leave every warehouse property, removal_epoch
    # included, byte-identical. A crash-retry (partial commits present
    # under this epoch's batch id) still runs and bumps the epoch once.
    if not cat.batch_appended("removal_sets", batch_id):
        n_live = (
            cat.read(spark, "text").join(urls, "url", "leftsemi").count()
            if cat.exists("text")
            else 0
        )
        if n_live == 0:
            result.timings["remove"] = 0.0
            result.counts["removed_entities"] = 0
            result.counts["touched_entities"] = 0
            result.counts["touched_doc_edges"] = 0
            result.stages_run = ["delta_remove"]
            for table in ("nodes", "edges", "mentions"):
                result.counts[table] = cat.read(spark, table).count()
            return result

    started = time.time()
    stats = delta_unlink(
        spark, cat, urls, batch_id, link_mode=link_mode, n_buckets=n_buckets
    )
    result.timings["remove"] = round(time.time() - started, 3)
    result.timings.update({f"remove_{k}": v for k, v in stats.timings.items()})
    result.counts["removed_entities"] = stats.n_removed_entities
    result.counts["touched_entities"] = stats.n_touched_entities
    result.counts["touched_doc_edges"] = stats.n_touched_doc_edges
    result.stages_run = ["delta_remove"]
    if "search_index" in stats.timings:
        result.stages_run.append("search_index")

    # fence: completed removals bump the epoch so identical future batch
    # payloads (re-adds, repeated removals) get fresh idempotency keys
    cat.set_property("removal_epoch", epoch + 1)

    _auto_compact(spark, cat, result, compact_appends_after)

    for table in ("nodes", "edges", "mentions"):
        result.counts[table] = cat.read(spark, table).count()
    _maybe_retrain_ivf(spark, cat, result)

    # the removal's decision sets are dead once the epoch advanced (only
    # an in-flight retry of THIS batch ever reads them); dropping the
    # table bounds its otherwise-monotonic growth under sustained removal
    cat.drop("removal_sets")
    return result
