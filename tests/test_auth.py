"""F6 — bearer auth gate parity with middleware/auth.rs:6-27."""

from __future__ import annotations

import pytest

from otel_worker_spark.auth import UNAUTHORIZED, check_bearer, split_authorized


@pytest.mark.parametrize(
    ("header", "ok"),
    [
        ("Bearer s3cret", True),
        ("Bearer wrong", False),
        ("bearer s3cret", False),      # scheme is case-sensitive
        ("Bearer  s3cret", False),     # split_once: token = " s3cret"
        ("Bearers3cret", False),       # no space at all
        ("Basic s3cret", False),
        ("", False),
        (None, False),
        ("Bearer s3cret extra", False),  # token = "s3cret extra"
        ("Bearer", False),
    ],
)
def test_check_bearer(header, ok):
    assert check_bearer(header, "s3cret") is ok


def test_split_authorized_matches_scalar(spark):
    headers = [
        "Bearer s3cret", "Bearer wrong", "bearer s3cret", "Bearer  s3cret",
        "Bearers3cret", "Basic s3cret", "", None, "Bearer s3cret extra", "Bearer",
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(headers)], "req_id int, authorization string"
    )
    good, bad = split_authorized(df, "s3cret")
    good_ids = {r.req_id for r in good.collect()}
    expected = {i for i, h in enumerate(headers) if check_bearer(h, "s3cret")}
    assert good_ids == expected == {0}
    rejected = bad.collect()
    assert len(rejected) == len(headers) - 1
    assert all(r.status == UNAUTHORIZED for r in rejected)
