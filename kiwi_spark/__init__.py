"""kiwi_spark — a from-scratch, PySpark-native rebuild of the OFFIS-RIT/kiwi
document-to-knowledge-graph pipeline, re-expressed as a batch DataFrame DAG
over Common-Crawl-style web pages.

Reference semantics (WHAT is computed) come from /root/reference (see SURVEY.md);
execution (HOW) is idiomatic Spark: declarative DataFrame/SQL plans, Arrow-batched
pandas UDFs for the text-processing kernels, blocking-key joins + iterative
large-star/small-star connected components for entity canonicalization, and
parquet stage tables (Iceberg-shaped; see kiwi_spark.sources.catalog) for
checkpoint/resume.

Layout:
  functions/   pure-Python kernels (no Spark import): HTML->markdown renderer,
               tokenizer, semantic chunker, extraction grammar, linking keys,
               minhash/simhash/text-stats.
  operators/   Spark stages built on the kernels: extract_text, chunk,
               extract_triples, link (blocking + CC), materialize, dedup,
               similarity.
  sources/     pages synthesizer (seeded, deterministic) + table catalog.
  plans/       graph query operators (entity search, k-hop, path, sources).
  streaming/   Structured Streaming variants (events windowed aggregation).
  pipeline.py  the resumable DAG driver.
"""

__version__ = "0.1.0"
