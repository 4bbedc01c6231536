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


def test_query_cli_indexed_search(tmp_path):
    """--indexed serves search from the warehouse index tables and returns
    the same top rows as the full-scan path."""
    warehouse = str(tmp_path / "wh_idx")
    env = dict(os.environ, LANG="C.UTF-8")
    build = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--synthesize", "60", "--warehouse", warehouse, "--search-index",
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    import duckdb
    import glob
    nodes_files = glob.glob(os.path.join(warehouse, "nodes", "snap-*", "*.parquet"))
    name = duckdb.sql(
        f"select name from read_parquet({nodes_files!r}) "
        "order by n_sources desc limit 1"
    ).fetchone()[0]

    outputs = {}
    for flag in ([], ["--indexed"]):
        run = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                os.path.join(REPO, "jobs", "run_queries.py"),
                "--warehouse", warehouse, "--search", name, *flag,
            ],
            capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
        )
        assert run.returncode == 0, run.stderr[-2000:]
        outputs[bool(flag)] = run.stdout
    assert name.split()[0] in outputs[True]
    # identical result tables from both paths
    tbl = [l for l in outputs[True].splitlines() if l.startswith(("+", "|"))]
    tbl_scan = [l for l in outputs[False].splitlines() if l.startswith(("+", "|"))]
    assert tbl == tbl_scan and len(tbl) > 4
