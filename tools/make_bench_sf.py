"""Deterministic sf1 bench dataset generator (VERDICT r4 #5).

The driver ships sf0.1 (~600k lineitem / 5k documents); at that scale the
headline queries finish in 0.2-1s and per-round deltas drown in scheduler
noise (BENCH_r04 spreads up to 8-10×). This tool synthesizes a 10× tier
("sf1") with the SAME schemas and distribution shapes as the driver's
tables (measured from sf0.1: key ranges, date windows, category
frequencies, doc length/vocab profile, events user density), so the
workload per row is comparable and medians become stable.

Everything is generated with Spark column expressions seeded by
``xxhash64`` — fully deterministic across runs and machines, no Python
RNG, no data files. bench.py invokes this on demand and caches the
output; regeneration costs ~1 min at local[32].

Row counts (10× sf0.1): region 5, nation 25, supplier 10k, customer
150k, part 200k, orders 1.5M, lineitem 6M, events 1M (15k users, same
30-day window → identical per-user density for the sessionizer),
documents 50k, embeddings 20k.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

GENERATOR_VERSION = "v1"

_WORDS = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "cache", "plan", "stage",
]
_LANGS = ["en", "en", "zh", "fr", "es", "de"]  # en ~2× like sf0.1
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_PTYPES = ["SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO", "STANDARD"]
_PNAMES = ["ring", "box", "case", "wheel", "gear", "pin", "bolt", "cap"]


def _h(seed: str, *cols) -> F.Column:
    return F.xxhash64(F.lit(seed), *cols)


def _u(seed: str, *cols) -> F.Column:
    """Deterministic uniform double in [0, 1)."""
    return (F.pmod(_h(seed, *cols), F.lit(1_000_000)) / 1_000_000.0).cast(
        "double"
    )


def _pick(arr: list[str], seed: str, *cols) -> F.Column:
    lit_arr = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit_arr, (F.pmod(_h(seed, *cols), F.lit(len(arr))) + 1).cast("int"))


def _ids(spark: SparkSession, n: int, name: str = "id") -> DataFrame:
    return spark.range(n).withColumnRenamed("id", name)


def gen_region(spark):
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(_REGIONS)], "r_regionkey int, r_name string"
    )


def gen_nation(spark):
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def gen_supplier(spark, n):
    return _ids(spark, n, "s_suppkey").select(
        F.col("s_suppkey"),
        F.format_string("Supplier#%09d", "s_suppkey").alias("s_name"),
        F.pmod(_h("sn", "s_suppkey"), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(_u("sb", "s_suppkey") * 9000 + 1000, 2).alias("s_acctbal"),
    )


def gen_customer(spark, n):
    return _ids(spark, n, "c_custkey").select(
        "c_custkey",
        F.format_string("Customer#%09d", "c_custkey").alias("c_name"),
        F.pmod(_h("cn", "c_custkey"), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(_u("cb", "c_custkey") * 10000 - 1000, 2).alias("c_acctbal"),
        _pick(_SEGMENTS, "cs", F.col("c_custkey")).alias("c_mktsegment"),
    )


def gen_part(spark, n):
    return _ids(spark, n, "p_partkey").select(
        "p_partkey",
        F.concat(
            F.lower(_pick(_PTYPES, "pt", F.col("p_partkey"))),
            F.lit(" "),
            _pick(_PNAMES, "pn", F.col("p_partkey")),
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"), F.pmod(_h("pb", "p_partkey"), F.lit(10)).cast("string")
        ).alias("p_brand"),
        _pick(_PTYPES, "pt", F.col("p_partkey")).alias("p_type"),
        (F.pmod(_h("ps", "p_partkey"), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(_u("pp", "p_partkey") * 1900 + 100, 2).alias("p_retailprice"),
    )


def gen_orders(spark, n, n_cust):
    days = 2405  # 1995-01-01 .. 2001-08-01
    return _ids(spark, n, "o_orderkey").select(
        "o_orderkey",
        F.pmod(_h("oc", "o_orderkey"), F.lit(n_cust)).alias("o_custkey"),
        _pick(["O", "F", "P"], "os", F.col("o_orderkey")).alias("o_orderstatus"),
        F.round(_u("ot", "o_orderkey") * 450000 + 900, 2).alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-01"), "yyyy-MM-dd")
            + F.pmod(_h("od", "o_orderkey"), F.lit(days)) * 86400
        ).alias("o_orderdate"),
        _pick(_PRIORITIES, "op", F.col("o_orderkey")).alias("o_orderpriority"),
    )


def gen_lineitem(spark, n, n_orders, n_parts, n_supp):
    days = 2500
    base = _ids(spark, n, "i")
    price = F.round(_u("lp", "i") * 100000 + 1000, 2)
    return base.select(
        F.pmod(_h("lo", "i"), F.lit(n_orders)).alias("l_orderkey"),
        F.pmod(_h("lk", "i"), F.lit(n_parts)).alias("l_partkey"),
        F.pmod(_h("ls", "i"), F.lit(n_supp)).alias("l_suppkey"),
        (F.pmod(F.col("i"), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(_h("lq", "i"), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        price.alias("l_extendedprice"),
        (F.pmod(_h("ld", "i"), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(_h("lt", "i"), F.lit(9)) / 100.0).alias("l_tax"),
        _pick(["A", "N", "R"], "lr", F.col("i")).alias("l_returnflag"),
        _pick(["O", "F"], "ll", F.col("i")).alias("l_linestatus"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-02"), "yyyy-MM-dd")
            + F.pmod(_h("lsd", "i"), F.lit(days)) * 86400
        ).alias("l_shipdate"),
    )


def gen_events(spark, n, n_users):
    window_s = 30 * 86400
    return _ids(spark, n, "event_id").select(
        "event_id",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01"), "yyyy-MM-dd")
            + F.pmod(_h("et", "event_id"), F.lit(window_s))
            + _u("etf", "event_id")
        ).alias("ts"),
        F.pmod(_h("eu", "event_id"), F.lit(n_users)).alias("user_id"),
        _pick(_EVENT_TYPES, "ee", F.col("event_id")).alias("event_type"),
        F.round(_u("ev", "event_id") * 100, 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(_h("ep", "event_id"), F.lit(100)).cast("int")
        ).alias("props"),
    )


def gen_documents(spark, n):
    """Docs = hash-chosen word sequences from the sf0.1 vocab, lengths
    8-60 words (n_chars ~44-460). A 0.5% tail of docs copies an earlier
    doc's word sequence verbatim (exact dups for the dedup families) and
    another 1% mutates one word (near-dups for MinHash/Jaccard)."""
    base = _ids(spark, n, "doc_id")
    # dup structure: last 0.5% duplicate doc_id - n//2; next 1% near-dup
    kind = F.when(F.pmod(F.col("doc_id"), F.lit(200)) == 199, F.lit(2)).when(
        F.pmod(F.col("doc_id"), F.lit(100)) == 98, F.lit(1)
    ).otherwise(F.lit(0))
    src = F.when(kind > 0, F.col("doc_id") - F.lit(n // 2)).otherwise(
        F.col("doc_id")
    )
    src = F.when(src < 0, F.col("doc_id")).otherwise(src)
    length = (F.pmod(_h("dl", src), F.lit(53)) + 8).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            (F.pmod(_h("dw", src, i), F.lit(len(_WORDS))) + 1).cast("int"),
        ),
    )
    # near-dup: replace the word at a hash-chosen position
    mut_pos = F.pmod(_h("dm", F.col("doc_id")), length.cast("bigint"))
    words = F.when(
        kind == 1,
        F.transform(
            words,
            lambda w, i: F.when(
                i.cast("bigint") == mut_pos,
                F.element_at(
                    F.array(*[F.lit(w2) for w2 in _WORDS]),
                    (F.pmod(_h("dw2", F.col("doc_id")), F.lit(len(_WORDS))) + 1).cast("int"),
                ),
            ).otherwise(w),
        ),
    ).otherwise(words)
    text = F.array_join(words, " ")
    return base.select(
        "doc_id",
        text.alias("text"),
        _pick(_LANGS, "dg", F.col("doc_id")).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(_h("ds", "doc_id"), F.lit(20)).cast("string")
        ).alias("source"),
        F.length(text).alias("n_chars"),
    )


def gen_embeddings(spark, n, dim=64):
    vals = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((
            F.pmod(_h("em", F.col("vec_id"), i), F.lit(10000)) / 10000.0 - 0.5
        ) * 0.6).cast("float"),
    )
    return _ids(spark, n, "vec_id").select(
        "vec_id",
        vals.alias("embedding"),
        F.pmod(_h("el", "vec_id"), F.lit(8)).cast("int").alias("label"),
    )


TABLES = {
    "region": lambda spark, f: gen_region(spark),
    "nation": lambda spark, f: gen_nation(spark),
    "supplier": lambda spark, f: gen_supplier(spark, 1000 * f),
    "customer": lambda spark, f: gen_customer(spark, 15000 * f),
    "part": lambda spark, f: gen_part(spark, 20000 * f),
    "orders": lambda spark, f: gen_orders(spark, 150000 * f, 15000 * f),
    "lineitem": lambda spark, f: gen_lineitem(
        spark, 600000 * f, 150000 * f, 20000 * f, 1000 * f
    ),
    "events": lambda spark, f: gen_events(spark, 100000 * f, 1500 * f),
    "documents": lambda spark, f: gen_documents(spark, 5000 * f),
    "embeddings": lambda spark, f: gen_embeddings(spark, 2000 * f),
}


def marker_path(out_dir: str) -> str:
    return os.path.join(out_dir, f"_GENERATED_{GENERATOR_VERSION}")


def generate(spark: SparkSession, out_dir: str, factor: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in TABLES.items():
        fn(spark, factor).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    with open(marker_path(out_dir), "w") as fh:
        fh.write(f"factor={factor}\n")


def ensure(spark: SparkSession, out_dir: str, factor: int = 10) -> str:
    if not os.path.exists(marker_path(out_dir)):
        generate(spark, out_dir, factor)
    return out_dir


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kiwi_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kiwi_bench_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("bench-gen", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, out, factor)
    print("generated", out)
