"""Stateful streaming sessionization (applyInPandasWithState) must
produce exactly the batch ``ops.timeseries.sessionize`` result: every
session the batch op computes is emitted as a closed session by the
stream once a flush event pushes each user past the gap horizon."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from otel_worker_spark.ops.timeseries import TS_FMT, sessionize
from otel_worker_spark.streaming import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"
GAP_S = 1800


def test_stream_sessionize_matches_batch(spark, tmp_root):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # flush: one far-future event per user closes that user's last
    # real session via in-batch gap detection. All flushes share ONE
    # GLOBAL timestamp: the final watermark lands at T_flush - gap,
    # BEFORE any flush session's timeout (T_flush + gap), so the open
    # flush sessions themselves are never emitted — a per-user flush
    # time would let early-finishing users' flush sessions time out.
    t_flush = F.lit(
        events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    ) + F.expr(f"INTERVAL {3 * GAP_S} SECONDS")
    flush = events.groupBy("user_id").agg(t_flush.alias("ts")).select(
        F.lit(10**12).alias("event_id"),
        "ts",
        "user_id",
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    src = os.path.join(tmp_root, "events")
    events.select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value", "props",
    ).unionByName(flush).write.parquet(src)

    q = sessionize_stream(
        spark, src, os.path.join(tmp_root, "ckpt"), gap_s=GAP_S,
        query_name="t_sessions",
    )
    q.awaitTermination(180)

    got = (
        spark.table("t_sessions")
        .select(
            "user_id",
            F.date_format("session_start", TS_FMT).alias("session_start"),
            F.date_format("session_end", TS_FMT).alias("session_end"),
            "n_events",
            "n_event_types",
            "value_c",
        )
        .toPandas()
    )
    want = (
        sessionize(events, gap_s=GAP_S)
        .drop("session_idx")
        .toPandas()
    )
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b)
    assert a.equals(b)
