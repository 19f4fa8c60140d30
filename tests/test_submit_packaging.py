"""Cluster-deploy packaging: the spark-submit --py-files story, round
tripped for real (BASELINE.json execution constraint: "runs via
spark-submit --py-files on multi-executor clusters").

`jobs.py package` builds otel_worker_spark.zip; the test then
spark-submits an ingest FROM A SCRATCH CWD holding only jobs.py, so
every `otel_worker_spark.*` import in the submitted job must resolve
from the zip (driver and Python workers) — exactly what a cluster
deploy exercises. The store the submitted JVM wrote is then read back
by this suite's own session.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_round_trip(spark, tmp_root):
    from otel_worker_spark.fixtures import token_sequences_from_events
    from otel_worker_spark.pipeline import PipelineStores

    zip_path = os.path.join(tmp_root, "otel_worker_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs.py"), "package", "--out", zip_path],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    assert json.loads(out.stdout)["modules"] >= 20
    assert os.path.getsize(zip_path) > 10_000

    tok_dir = os.path.join(tmp_root, "tokens")
    token_sequences_from_events(spark, "/root/testdata/sf0.001").limit(
        40
    ).write.parquet(tok_dir)
    stores_dir = os.path.join(tmp_root, "stores")

    scratch = os.path.join(tmp_root, "scratch")
    os.makedirs(scratch)
    shutil.copy(os.path.join(REPO, "jobs.py"), scratch)
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            "spark-submit", "--py-files", zip_path, "jobs.py",
            "ingest", "--tokens", tok_dir, "--stores", stores_dir,
        ],
        capture_output=True, text=True, cwd=scratch, env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    receipt = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert receipt["row_count"] > 0 and receipt["skipped"] is False

    spans = PipelineStores(spark, stores_dir).spans.read()
    assert spans.count() > 0
