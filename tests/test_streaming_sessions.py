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


def test_stream_sessionize_out_of_order_across_batches(spark, tmp_root):
    """An event arriving in a LATER micro-batch (above the watermark)
    with a ts inside the open session must widen the session, never
    regress its end: state tracks (min, max), so the closed session
    reports the true span."""
    import os as _os
    import time as _time

    def _write(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    from datetime import datetime

    src = _os.path.join(tmp_root, "ooo-events")
    ckpt = _os.path.join(tmp_root, "ooo-ckpt")
    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    # file 1 → micro-batch 1: two in-order events of one session
    _write(
        [(1, t("10:00:00"), 1, "a", 1.0, "{}"), (2, t("10:05:00"), 1, "b", 2.0, "{}")]
    )
    _time.sleep(1.1)  # file-source orders by mod time — keep files distinct
    # file 2 → micro-batch 2: an out-of-order event INSIDE the open
    # session (above the watermark: 10:05 - gap = 09:35), plus a
    # far-future flush to close it
    _write(
        [
            (3, t("10:02:00"), 1, "c", 3.0, "{}"),
            (4, t("13:00:00"), 1, "flush", 0.0, "{}"),
        ]
    )
    q = sessionize_stream(
        spark, src, ckpt, gap_s=GAP_S, query_name="ooo_s1", max_files_per_trigger=1
    )
    q.awaitTermination(120)

    rows = spark.table("ooo_s1").collect()
    assert len(rows) == 1
    r = rows[0]
    assert str(r.session_start) == "2024-01-01 10:00:00"
    assert str(r.session_end) == "2024-01-01 10:05:00"  # NOT regressed to 10:02
    assert r.n_events == 3 and r.n_event_types == 3 and r.value_c == 600


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
