"""Deliberate spill + AQE skew-split coverage (r4 verdict item 4):
the sf0.1 audit shows zero spill anywhere, so those paths were
untested. These tests drive them on purpose:

- forced spill: a tiny window buffer threshold pushes the REAL
  UnsafeExternalSorter spill machinery (memory+disk), result must be
  byte-identical to the unthresholded run; a subprocess run under the
  event log asserts bytes actually spilled;
- AQE skew split: a 90%-hot-key sort-merge join with lowered skew
  thresholds must show the skew-split in the final adaptive plan and
  still produce the exact row count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from otel_worker_spark.registry import rel_window_topn

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_forced_window_spill_is_correct(spark):
    """Same session (the threshold is a dynamic SQL conf): the spilled
    run must produce exactly the unthresholded rows."""
    base = sorted(map(str, rel_window_topn(spark, SF_DIR).collect()))
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "8")
    try:
        spilled = sorted(map(str, rel_window_topn(spark, SF_DIR).collect()))
    finally:
        spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
        spark.conf.unset("spark.sql.windowExec.buffer.in.memory.threshold")
    assert spilled == base and len(base) > 100


def test_forced_spill_writes_bytes(tmp_root):
    """Subprocess under the event log: the forced-spill probe must
    record nonzero spilled bytes (proof the spill path RAN, not just
    that a conf was set)."""
    sys.path.insert(0, REPO)
    import shuffle_audit as sa

    script = f"""
import json, sys
sys.path.insert(0, {REPO!r})
import shuffle_audit as sa
walls, probe = sa.run_queries({SF_DIR!r}, 4, [], {tmp_root!r})
print("PROBE " + json.dumps(probe))
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    probe = json.loads(
        next(l for l in proc.stdout.splitlines() if l.startswith("PROBE "))[6:]
    )
    assert probe["rows_match_unthresholded"] is True
    metrics = sa.parse_event_log(tmp_root)
    got = metrics.get(sa.SPILL_PROBE_GROUP, {})
    assert got.get("spill_memory_bytes", 0) + got.get("spill_disk_bytes", 0) > 0, got


def test_aqe_skew_join_splits_hot_partition(spark):
    """90% of the left side hashes to ONE key; with lowered skew
    thresholds AQE must split that partition (visible in the final
    adaptive plan) and the join output must be exact."""
    n = 200_000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 1000 + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    # every left key has exactly one match → expected count == n
    right = spark.range(1001).select(F.col("id").alias("k"), F.lit(1).alias("p"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's queryExecution, so the
        # adaptive plan below is the finalized one (count() would spin
        # up a separate execution and leave this plan isFinalPlan=false)
        assert len(joined.collect()) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    # AQE marks the split join/reader: SortMergeJoin(skew=true) and/or
    # "AQEShuffleRead ... skewed"
    assert "skew=true" in plan or "skewed" in plan, plan[:4000]
