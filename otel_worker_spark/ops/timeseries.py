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

# ------------------------------------------------- bucketized range join

#: interval width for the range join (seconds). Each error event opens
#: a [ts, ts + RANGE_WINDOW_S) impact window.
RANGE_WINDOW_S = 300


def range_join(events: DataFrame, window_s: int = RANGE_WINDOW_S) -> DataFrame:
    """Interval (range) join without a theta-join: every ``error``
    event opens a ``[ts, ts + window_s)`` window; count the same
    user's OTHER events that fall inside it.

    Spark has no native range join (OSS Catalyst plans
    ``a.ts BETWEEN b.lo AND b.hi`` as BroadcastNestedLoop / cartesian
    — a non-starter at 100 TB). The scale-correct shape is time
    BUCKETIZATION: pick the bucket width equal to the interval width,
    explode each interval to the ≤2 buckets it overlaps, give each
    probe event its single bucket, equi-join on (user_id, bucket) and
    re-check the exact bounds. The join is a plain hash join whose key
    includes time, so a 1000-executor cluster shuffles each hour of
    data to one place instead of comparing everything with everything.
    A probe event lives in exactly one bucket, so no dedup pass is
    needed — each (interval, probe) pair meets at most once.

    Reference analog: the reference's time filtering is a per-query
    BETWEEN over SQLite (`otel-worker-core/src/data/sql.rs:88-101`);
    this is the distributed form of the same predicate applied
    interval-at-a-time.
    """
    us = 1_000_000
    bucket_us = window_s * us
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        ts_us.alias("start_us"),
        (ts_us + F.lit(window_s * us)).alias("end_us"),
    )
    # ≤2 covered buckets per interval (width == bucket width)
    intervals = errors.withColumn(
        "bucket",
        F.explode(
            F.expr(
                f"sequence(start_us div {bucket_us}, (end_us - 1) div {bucket_us})"
            )
        ),
    )
    probes = events.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        "event_type",
        ts_us.alias("p_us"),
        _cents("value").alias("value_c"),
    ).withColumn("bucket", F.expr(f"p_us div {bucket_us}"))
    hits = (
        intervals.join(probes, ["user_id", "bucket"])
        .filter((F.col("p_us") >= F.col("start_us")) & (F.col("p_us") < F.col("end_us")))
        .groupBy("error_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("event_type").alias("n_hit_types"),
            F.sum("value_c").alias("hit_value_c"),
        )
    )
    return (
        errors.join(hits, "error_id", "left")
        .select(
            "error_id",
            "user_id",
            "start_us",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce("n_hit_types", F.lit(0)).alias("n_hit_types"),
            F.coalesce("hit_value_c", F.lit(0)).alias("hit_value_c"),
        )
    )


def range_join_sql(window_s: int = RANGE_WINDOW_S) -> str:
    return f"""
WITH e AS (
  SELECT event_id AS error_id, user_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + {window_s} * 1000000 AS end_us
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT event_id AS probe_id, user_id, event_type,
         epoch_us(ts) AS p_us,
         CAST(round(100 * value) AS BIGINT) AS value_c
  FROM events WHERE event_type <> 'error'
), h AS (
  SELECT e.error_id,
         count(*) AS n_hits,
         count(DISTINCT p.event_type) AS n_hit_types,
         CAST(sum(p.value_c) AS BIGINT) AS hit_value_c
  FROM e JOIN p ON e.user_id = p.user_id
              AND p.p_us >= e.start_us AND p.p_us < e.end_us
  GROUP BY e.error_id
)
SELECT e.error_id, e.user_id, e.start_us,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hit_types, 0) AS n_hit_types,
       coalesce(h.hit_value_c, 0) AS hit_value_c
FROM e LEFT JOIN h USING (error_id)
"""


# ----------------------------------------------------------- funnel

#: ordered funnel stages (strictly increasing timestamps required)
FUNNEL_STAGES = ("signup", "click", "purchase")


def funnel(events: DataFrame, stages: tuple[str, ...] = FUNNEL_STAGES) -> DataFrame:
    """Ordered funnel: per user, the earliest chain of ``stages``
    events with strictly increasing timestamps (classic product
    funnel / distributed sequential pattern match).

    One exchange on ``user_id``: collect the user's (ts, type) pairs,
    sort in-partition, and FOLD once with an ``aggregate`` HOF whose
    state is the partial chain — no self-joins, no per-stage re-scan
    of the corpus (the naive SQL form joins the events table once per
    stage; at 100 TB that is ``len(stages)`` shuffles instead of one).
    The oracle uses the per-stage-join form, proving the fold
    equivalent.
    """
    assert len(stages) == 3, "fold below is written for 3 stages"
    s0, s1, s2 = stages
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (
        events.filter(F.col("event_type").isin(*stages))
        .select("user_id", ts_us.alias("us"), "event_type")
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("us", "event_type"))).alias("evs"))
    )
    # fold state: (t0, t1, t2) nullable epoch-µs; an event advances the
    # chain only if its stage is next and its ts is strictly later
    fold = f"""
    aggregate(
      evs,
      named_struct('t0', CAST(NULL AS BIGINT), 't1', CAST(NULL AS BIGINT), 't2', CAST(NULL AS BIGINT)),
      (st, e) -> CASE
        WHEN e.event_type = '{s0}' AND st.t0 IS NULL
          THEN named_struct('t0', e.us, 't1', st.t1, 't2', st.t2)
        WHEN e.event_type = '{s1}' AND st.t0 IS NOT NULL AND st.t1 IS NULL AND e.us > st.t0
          THEN named_struct('t0', st.t0, 't1', e.us, 't2', st.t2)
        WHEN e.event_type = '{s2}' AND st.t1 IS NOT NULL AND st.t2 IS NULL AND e.us > st.t1
          THEN named_struct('t0', st.t0, 't1', st.t1, 't2', e.us)
        ELSE st
      END
    )
    """
    return per_user.select(
        "user_id", F.expr(fold).alias("st")
    ).select(
        "user_id",
        F.col("st.t0").alias("t_signup_us"),
        F.col("st.t1").alias("t_click_us"),
        F.col("st.t2").alias("t_purchase_us"),
        (
            F.col("st.t0").isNotNull().cast("int")
            + F.col("st.t1").isNotNull().cast("int")
            + F.col("st.t2").isNotNull().cast("int")
        ).alias("depth"),
    )


def funnel_sql(stages: tuple[str, ...] = FUNNEL_STAGES) -> str:
    s0, s1, s2 = stages
    return f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events WHERE event_type IN ('{s0}', '{s1}', '{s2}')
), st0 AS (
  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = '{s0}' GROUP BY user_id
), st1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t1
  FROM events e JOIN st0 ON e.user_id = st0.user_id
  WHERE e.event_type = '{s1}' AND epoch_us(e.ts) > st0.t0
  GROUP BY e.user_id
), st2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN st1 ON e.user_id = st1.user_id
  WHERE e.event_type = '{s2}' AND epoch_us(e.ts) > st1.t1
  GROUP BY e.user_id
)
SELECT u.user_id,
       st0.t0 AS t_signup_us,
       st1.t1 AS t_click_us,
       st2.t2 AS t_purchase_us,
       (CASE WHEN st0.t0 IS NULL THEN 0 ELSE 1 END
        + CASE WHEN st1.t1 IS NULL THEN 0 ELSE 1 END
        + CASE WHEN st2.t2 IS NULL THEN 0 ELSE 1 END) AS depth
FROM u
LEFT JOIN st0 USING (user_id)
LEFT JOIN st1 USING (user_id)
LEFT JOIN st2 USING (user_id)
"""
