"""Kill a real spark-submit pipeline run mid-flight, then resume.

Evidence for the snapshot-checkpoint contract: a SIGKILLed run leaves only
committed snapshots visible; `--resume` skips them and completes, and the
result equals an uninterrupted run.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _launch(warehouse, resume=False):
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--synthesize", "40", "--warehouse", warehouse,
    ]
    if resume:
        cmd.append("--resume")
    env = dict(os.environ)
    env["SPARK_GRAFT_MASTER"] = "local[4]"
    return subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd=REPO,
        start_new_session=True,  # so we can kill the whole tree
    )


def test_sigkill_then_resume(spark, tmp_path):
    wh = str(tmp_path / "wh")
    proc = _launch(wh)
    try:
        # wait until the text stage commits, then kill hard mid-raw_graph
        manifest = os.path.join(wh, "text", "MANIFEST.json")
        deadline = time.time() + 240
        while time.time() < deadline and not os.path.exists(manifest):
            time.sleep(0.5)
            if proc.poll() is not None:
                pytest.fail("pipeline exited before text commit")
        assert os.path.exists(manifest), "text stage never committed"
        time.sleep(1.0)  # let raw_graph start
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        proc.wait()

    # committed state is readable; later stages absent
    from kiwi_spark.sources.catalog import Catalog

    cat = Catalog(wh)
    assert cat.exists("text")
    n_text = cat.read(spark, "text").count()
    assert n_text == 40
    assert not cat.exists("nodes")

    # resume completes and skips the committed prefix
    proc2 = _launch(wh, resume=True)
    out, _ = proc2.communicate(timeout=300)
    assert proc2.returncode == 0, out.decode()[-2000:]
    result = json.loads(out.decode().strip().splitlines()[-1])
    assert "text" in result["stages_skipped"]
    assert "graph" in result["stages_run"]
    assert result["counts"]["nodes"] > 0

    # equals an uninterrupted run
    wh_ref = str(tmp_path / "ref")
    proc3 = _launch(wh_ref)
    out3, _ = proc3.communicate(timeout=300)
    assert proc3.returncode == 0
    ref = json.loads(out3.decode().strip().splitlines()[-1])
    assert ref["counts"] == result["counts"]
