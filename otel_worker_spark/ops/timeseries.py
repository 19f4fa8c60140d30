"""Event-stream (log-analytics) operators: sessionization and as-of
join over the ``events`` table.

Both are operators the reference's SQLite read path cannot express in
one statement but that any telemetry/log pipeline at scale needs
(sessionize = the batch twin of Structured Streaming's session
windows; as-of = the point-in-time enrich every metrics join wants).

Scale shape for BOTH: a single hash exchange on ``user_id`` followed
by one in-partition sort — the merge-as-of / gap-detection layout a
1000-executor cluster wants. No self-join, no range cross-product; a
hot user is bounded by its own event count, and AQE's skew split
handles a pathological one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"

#: session gap threshold (seconds). 1800 s = the classic 30-minute
#: web-analytics cutoff.
SESSION_GAP_S = 1800


def _cents(col: str) -> F.Column:
    return F.expr(f"CAST(round(100 * {col}) AS BIGINT)")


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Assign events to sessions (new session when the per-user gap
    exceeds ``gap_s``), then roll up one row per session: bounds,
    event count, distinct event types, exact value cents.

    lag → flag → running sum is the textbook distributed
    sessionization: the window and the rollup share the ``user_id``
    hash partitioning, so Catalyst plans ONE exchange for both.
    """
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(ts)
    flagged = events.select(
        "user_id",
        ts.alias("ts"),
        "event_type",
        _cents("value").alias("value_c"),
        F.when(
            F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
            > gap_s * 1_000_000,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    # first event per user has lag NULL → comparison NULL → otherwise(0);
    # numbering from 0 keeps it a plain running sum
    sess = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum("value_c").alias("value_c"),
    )


def sessionize_sql(gap_s: int = SESSION_GAP_S) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_type,
         CAST(round(100 * value) AS BIGINT) AS value_c,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > {gap_s} * 1000000 THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       strftime(min(ts), '{DUCK_TS_FMT}') AS session_start,
       strftime(max(ts), '{DUCK_TS_FMT}') AS session_end,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_event_types,
       CAST(sum(value_c) AS BIGINT) AS value_c
FROM sess GROUP BY user_id, session_idx
"""


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """As-of join: each ``left_type`` event picks up the most recent
    ``right_type`` event of the same user at-or-before its timestamp
    (point-in-time enrichment — Spark has no native ASOF JOIN;
    DuckDB's native ``ASOF LEFT JOIN`` is the oracle).

    Implementation is the union-merge form, not a range join: tag both
    sides, union, ONE window over (user_id ORDER BY ts, side) carrying
    the last right-side row forward (ignoreNulls), keep left rows.
    The side flag orders a right row BEFORE a left row at an equal
    timestamp, making the match inclusive (ts_right <= ts_left) —
    DuckDB ASOF's ``>=`` semantics exactly. Ties inside the right side
    resolve to the max event_id via the (ts, side, event_id) ordering,
    deterministic on both engines.
    """
    ts = F.col("ts").cast("timestamp")
    right = events.filter(F.col("event_type") == right_type).select(
        "user_id",
        ts.alias("ts"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("r_event_id"),
        _cents("value").alias("r_value_c"),
    )
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        ts.alias("ts"),
        F.lit(1).alias("side"),
        F.col("event_id"),
        _cents("value").alias("value_c"),
    )
    both = right.withColumn("event_id", F.lit(None).cast("long")).unionByName(
        left.withColumn("r_event_id", F.lit(None).cast("long")).withColumn(
            "r_value_c", F.lit(None).cast("long")
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.coalesce("r_event_id", "event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.select(
        "user_id",
        "ts",
        "side",
        "event_id",
        "value_c",
        F.last("r_event_id", ignorenulls=True).over(w).alias("matched_view_id"),
        F.last("r_value_c", ignorenulls=True).over(w).alias("matched_view_value_c"),
        F.date_format(
            F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
            TS_FMT,
        ).alias("matched_view_ts"),
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", TS_FMT).alias("purchase_ts"),
            "value_c",
            "matched_view_id",
            "matched_view_ts",
            "matched_view_value_c",
        )
    )


def asof_join_sql(left_type: str = "purchase", right_type: str = "view") -> str:
    return f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '{DUCK_TS_FMT}') AS purchase_ts,
       CAST(round(100 * p.value) AS BIGINT) AS value_c,
       v.event_id AS matched_view_id,
       strftime(v.ts, '{DUCK_TS_FMT}') AS matched_view_ts,
       CAST(round(100 * v.value) AS BIGINT) AS matched_view_value_c
FROM (SELECT * FROM events WHERE event_type = '{left_type}') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = '{right_type}') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""
