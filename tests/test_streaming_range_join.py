"""Stream-stream interval join: the pairs emitted by the watermarked
streaming join over micro-batches must equal the batch join on the
same events — including pairs whose two sides arrive in DIFFERENT
micro-batches (the buffered-state case)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from otel_worker_spark.streaming import range_join_stream

SF_DIR = "/root/testdata/sf0.001"


def _batch_pairs(events):
    errors = events.filter("event_type = 'error'").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").cast("timestamp").alias("e_ts"),
    )
    probes = events.filter("event_type != 'error'").select(
        F.col("event_id").alias("probe_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("p_ts"),
    )
    return errors.join(
        probes,
        F.expr(
            "e_user = p_user AND p_ts >= e_ts"
            " AND p_ts < e_ts + INTERVAL 300 SECONDS"
        ),
    ).select("error_id", "probe_id")


def test_stream_range_join_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "events-in")
    os.makedirs(src)
    # split by event_id parity → an error and its probes routinely land
    # in different micro-batches, forcing cross-batch state buffering
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(src + "/b0")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(src + "/b1")

    q = range_join_stream(
        spark,
        src + "/*",
        str(tmp_path / "ckpt"),
        events.schema,
        query_name="rj_stream_test",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    assert q.lastProgress is None or not q.isActive
    got = spark.sql("select error_id, probe_id from rj_stream_test")
    want = _batch_pairs(events)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # no duplicate emissions
    assert got.distinct().count() == got.count()
