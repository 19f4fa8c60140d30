"""Property-based checks (hypothesis) for the round-3 operators:
the bucketized range join must equal the naive theta-join on ANY
event set, and the funnel fold must equal a straightforward Python
reference on ANY event sequence — not just the fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from otel_worker_spark.ops import timeseries as ts

T0 = dt.datetime(2024, 1, 1)
TYPES = ["error", "click", "view", "signup", "purchase"]


def _events(draw_rows):
    return [
        Row(
            event_id=i,
            ts=T0 + dt.timedelta(seconds=sec),
            user_id=user,
            event_type=etype,
            value=1.0,
            props="{}",
        )
        for i, (user, etype, sec) in enumerate(draw_rows)
    ]


row_strategy = st.tuples(
    st.integers(min_value=0, max_value=3),           # user
    st.sampled_from(TYPES),                          # type
    st.integers(min_value=0, max_value=1200),        # seconds (spans >2 buckets)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_range_join_equals_naive_theta_join(spark, rows):
    events = spark.createDataFrame(_events(rows))
    got = {
        r.error_id: (r.n_hits, r.n_hit_types, r.hit_value_c)
        for r in ts.range_join(events).collect()
    }
    # naive reference: O(n^2) in Python
    errs = [(i, u, s) for i, (u, t, s) in enumerate(rows) if t == "error"]
    probes = [(i, u, t, s) for i, (u, t, s) in enumerate(rows) if t != "error"]
    want = {}
    for eid, eu, es in errs:
        hits = [
            (pt, 100)
            for pid, pu, pt, psec in probes
            if pu == eu and es <= psec < es + 300
        ]
        want[eid] = (len(hits), len({t for t, _ in hits}), sum(v for _, v in hits))
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_funnel_equals_python_reference(spark, rows):
    events = spark.createDataFrame(_events(rows))
    got = {
        r.user_id: (r.t_signup_us, r.t_click_us, r.t_purchase_us, r.depth)
        for r in ts.funnel(events).collect()
    }
    stages = ("signup", "click", "purchase")
    base_us = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    want = {}
    for user in {u for u, t, s in rows if t in stages}:
        evs = sorted(
            (base_us + s * 1_000_000, t) for u, t, s in rows
            if u == user and t in stages
        )
        t0 = t1 = t2 = None
        for us, t in evs:
            if t == stages[0] and t0 is None:
                t0 = us
            elif t == stages[1] and t0 is not None and t1 is None and us > t0:
                t1 = us
            elif t == stages[2] and t1 is not None and t2 is None and us > t1:
                t2 = us
        want[user] = (t0, t1, t2, sum(x is not None for x in (t0, t1, t2)))
    assert got == want
