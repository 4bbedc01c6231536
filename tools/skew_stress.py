"""Head-entity skew stress for the L14 fold member selection (VERDICT r3 #7).

    taskset -c 0-7 spark-submit --master 'local[8]' --driver-memory 12g \
        --conf spark.ui.enabled=false tools/skew_stress.py \
        [--hot 5000000] [--tail-groups 100000] [--out /tmp/skew_members]

Synthesizes a members table with ONE deliberately hot canonical entity
(``--hot`` members — the north_rule's head-entity case: a country-scale
entity mentioned by a large fraction of a web corpus) plus a long tail,
parquet-backed so Spark sees real statistics. Then times the
bottom-600-per-group selection (operators.link._fold_member_select,
``row_number() ≤ cap``) on the SAME input under two optimizer settings:

* unbounded_funnel — ``spark.sql.optimizer.excludedRules =
  InferWindowGroupLimit``: the window really does sort the hot group's
  full member set in one reducer task (the round-2-style funnel the
  VERDICT flagged);
* group_limit (production default) — Catalyst inserts a map-side
  Partial WindowGroupLimit before the exchange (each task keeps
  bottom-cap per group, so ≤ cap·n_map_partitions hot rows reach the
  reducer) and a Final one after — the built-in equivalent of a salted
  two-phase top-k, with one shuffle.

Both legs ``.count()`` so the sort fully executes. Also times the full
parity linking map (entity_id_map) over a matching nodes table where
every hot row shares one (type, compact key) — the hot bucket-anchor
path (_salted_min) — proving the linking stage is skew-proof end-to-end.

Prints one JSON line; medians over --reps runs with all walls reported.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

EXCLUDE_RULE = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"


def build_members(spark, hot: int, tail_groups: int, path: str):
    tail_rows = tail_groups * 10
    hot_df = spark.range(hot).select(
        F.lit("HOT").alias("canonical_id"),
        F.format_string("h%012d", F.col("id")).alias("entity_id"),
        F.concat(F.lit("mention of the head entity #"), F.col("id")).alias(
            "description"
        ),
        F.lit("UNITED STATES").alias("name"),
        F.lit("LOCATION").alias("type"),
    )
    tail_df = spark.range(tail_rows).select(
        F.format_string("t%08d", F.col("id") % tail_groups).alias("canonical_id"),
        F.format_string("e%012d", F.col("id")).alias("entity_id"),
        F.concat(F.lit("tail description "), F.col("id")).alias("description"),
        F.format_string("TAIL ENTITY %d", F.col("id") % tail_groups).alias("name"),
        F.lit("ORGANIZATION").alias("type"),
    )
    hot_df.unionByName(tail_df).repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--hot", type=int, default=5_000_000)
    parser.add_argument("--tail-groups", type=int, default=100_000)
    parser.add_argument("--cap", type=int, default=600)
    parser.add_argument("--out", default="/tmp/skew_members")
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    spark = (
        SparkSession.builder.appName("skew-stress")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    members = build_members(spark, args.hot, args.tail_groups, args.out)
    n = members.count()

    from kiwi_spark.operators.link import _fold_member_select, entity_id_map

    def run_select():
        return _fold_member_select(
            members.select("canonical_id", "entity_id", "description"), args.cap
        ).count()

    def timed(fn):
        walls = []
        value = None
        for _ in range(args.reps):
            started = time.time()
            value = fn()
            walls.append(round(time.time() - started, 2))
        return value, sorted(walls)[len(walls) // 2], walls

    spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDE_RULE)
    count_funnel, wall_funnel, walls_funnel = timed(run_select)
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    count_limit, wall_limit, walls_limit = timed(run_select)
    assert count_funnel == count_limit, (count_funnel, count_limit)

    # end-to-end linking map over the same skew shape: every hot row shares
    # one (type, compact key) — the hot bucket-anchor path (_salted_min)
    nodes = members.select("entity_id", "name", "type")
    count_link, wall_link, walls_link = timed(lambda: entity_id_map(nodes).count())

    print(
        json.dumps(
            {
                "rows": n,
                "hot_members": args.hot,
                "tail_groups": args.tail_groups,
                "cap": args.cap,
                "selected_rows": count_limit,
                "fold_select_unbounded_funnel_sec": wall_funnel,
                "fold_select_group_limit_sec": wall_limit,
                "speedup": round(wall_funnel / wall_limit, 2) if wall_limit else None,
                "entity_id_map_rows": count_link,
                "entity_id_map_sec": wall_link,
                "all_walls": {
                    "unbounded_funnel": walls_funnel,
                    "group_limit": walls_limit,
                    "entity_id_map": walls_link,
                },
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
