"""The read-side CLI surface (jobs/run_queries.py) end-to-end: build a
small warehouse with the pipeline, then drive every CLI verb in one
spark-submit invocation and check the printed sections."""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_query_cli_end_to_end(tmp_path):
    warehouse = str(tmp_path / "wh")
    env = dict(os.environ, LANG="C.UTF-8")
    build = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--synthesize", "60", "--warehouse", warehouse,
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    # pick a real entity name from the materialized nodes
    import duckdb
    import glob
    nodes_files = glob.glob(os.path.join(warehouse, "nodes", "snap-*", "*.parquet"))
    name = duckdb.sql(
        f"select name from read_parquet({nodes_files!r}) "
        "where type = 'PERSON' order by n_sources desc limit 1"
    ).fetchone()[0]

    query = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "jobs", "run_queries.py"),
            "--warehouse", warehouse,
            "--search", name,
            "--neighbours", name,
            "--sources-of", name,
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert query.returncode == 0, query.stderr[-2000:]
    out = query.stdout
    assert name.split()[0] in out  # the entity shows up in results
    # each verb printed a non-empty table (Spark's ASCII frame)
    assert out.count("+--") >= 3, out[-1500:]
