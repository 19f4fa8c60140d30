"""Watermark-bounded streaming funnel (r4 verdict item 6): on
in-watermark data, the stream's per-window chains must equal the
batch ``ops.timeseries.funnel`` exactly — proven here with a gap wide
enough that each user's whole history is one activity window, plus a
cross-batch out-of-order case showing the sort-at-close correction."""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F

from otel_worker_spark.ops.timeseries import FUNNEL_STAGES, funnel
from otel_worker_spark.streaming import funnel_stream

SF_DIR = "/root/testdata/sf0.001"

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _t(s: str) -> datetime:
    return datetime.fromisoformat(f"2024-01-01 {s}")


def test_stream_funnel_matches_batch_on_in_watermark_data(spark, tmp_root):
    """Gap spanning each user's full history → ONE window per user →
    the stream chain must equal the global batch funnel row for every
    user that has at least one stage event. Windows are closed by a
    single global non-stage flush event per user (in-batch gap close;
    flush windows carry no stage events and are never emitted)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    span_s = (
        events.agg(
            (
                F.unix_micros(F.max(F.col("ts").cast("timestamp")))
                - F.unix_micros(F.min(F.col("ts").cast("timestamp")))
            )
            / 1_000_000
        ).collect()[0][0]
    )
    gap_s = int(span_s) + 3600  # wider than any intra-user gap
    t_flush = F.lit(
        events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    ) + F.expr(f"INTERVAL {3 * gap_s} SECONDS")
    flush = events.groupBy("user_id").agg(t_flush.alias("ts")).select(
        F.lit(10**12).alias("event_id"),
        "ts",
        "user_id",
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )

    src = os.path.join(tmp_root, "funnel-events")
    ckpt = os.path.join(tmp_root, "funnel-ckpt")
    events.select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value", "props",
    ).write.parquet(src)
    time.sleep(1.1)
    flush.coalesce(1).write.mode("append").parquet(src)

    q = funnel_stream(spark, src, ckpt, gap_s=gap_s, query_name="funnel_eq")
    q.awaitTermination(300)

    got = {
        r.user_id: (r.t_signup_us, r.t_click_us, r.t_purchase_us, r.depth)
        for r in spark.table("funnel_eq").collect()
    }
    want = {
        r.user_id: (r.t_signup_us, r.t_click_us, r.t_purchase_us, r.depth)
        for r in funnel(events).collect()
    }
    assert got == want
    assert len(want) >= 10  # the fixture exercises a real user set


def test_stream_funnel_out_of_order_within_window(spark, tmp_root):
    """A stage event arriving in a LATER micro-batch, out of order but
    above the watermark, must be folded at window close as if it had
    arrived in order (buffer + sort-at-close)."""

    def _write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    src = os.path.join(tmp_root, "ooo-funnel")
    ckpt = os.path.join(tmp_root, "ooo-funnel-ckpt")
    s0, s1, s2 = FUNNEL_STAGES
    # batch 1: click (10:10) and purchase (10:20) — no chain without a
    # signup BEFORE the click
    _write(
        [
            (1, _t("10:10:00"), 7, s1, 0.0, "{}"),
            (2, _t("10:20:00"), 7, s2, 0.0, "{}"),
        ]
    )
    time.sleep(1.1)
    # batch 2: the signup arrives LATE (ts 10:00, above watermark) +
    # a far-future flush to close the window
    _write(
        [
            (3, _t("10:00:00"), 7, s0, 0.0, "{}"),
            (4, _t("15:00:00"), 7, "flush", 0.0, "{}"),
        ]
    )
    q = funnel_stream(
        spark, src, ckpt, gap_s=3600, query_name="funnel_ooo",
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    rows = spark.table("funnel_ooo").collect()
    assert len(rows) == 1
    r = rows[0]
    us = lambda s: int(_t(s).timestamp() * 1_000_000)
    assert (r.t_signup_us, r.t_click_us, r.t_purchase_us, r.depth) == (
        us("10:00:00"), us("10:10:00"), us("10:20:00"), 3
    )
    assert str(r.window_start) == "2024-01-01 10:00:00"
    assert str(r.window_end) == "2024-01-01 10:20:00"
