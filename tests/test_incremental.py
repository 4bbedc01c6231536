"""Incremental ingestion: appending pages then relinking must produce the
exact same canonical graph as a from-scratch run over all pages."""

from pyspark.sql import functions as F

from kiwi_spark.pipeline import incremental_add, run_pipeline
from kiwi_spark.sources.catalog import Catalog
from kiwi_spark.sources.pages import pages_df

SEED = 21


def _graph_signature(spark, warehouse):
    cat = Catalog(warehouse)
    nodes = {
        (r["entity_id"], r["name"], r["type"], r["n_sources"])
        for r in cat.read(spark, "nodes").collect()
    }
    edges = {
        (r["edge_id"], r["src_id"], r["dst_id"], r["pred"], r["strength"], r["n_sources"])
        for r in cat.read(spark, "edges").collect()
    }
    mentions = cat.read(spark, "mentions").count()
    return nodes, edges, mentions


def test_incremental_equals_full_run(spark, tmp_path):
    wh_full = str(tmp_path / "full")
    wh_incr = str(tmp_path / "incr")

    all_pages = pages_df(spark, 50, seed=SEED, partitions=4)
    first = all_pages.where(F.col("url") < "https://n")  # deterministic split
    rest = all_pages.where(~(F.col("url") < "https://n"))
    n_first, n_rest = first.count(), rest.count()
    assert n_first > 5 and n_rest > 5 and n_first + n_rest == 50

    run_pipeline(spark, all_pages, wh_full, collect_lineage=False)
    run_pipeline(spark, first, wh_incr, collect_lineage=False)
    result = incremental_add(spark, rest, wh_incr)
    assert result.counts["nodes"] > 0

    assert _graph_signature(spark, wh_incr) == _graph_signature(spark, wh_full)

    # the text table is the union, served from append snapshots
    cat = Catalog(wh_incr)
    assert cat.read(spark, "text").count() == 50
    assert len(cat.paths("text")) == 2  # fast-append: base + delta dirs
