"""The two parse engines (Catalyst expressions vs Arrow mapInPandas
kernel) must produce identical frames — same columns, same values,
row for row — on golden, events-derived, and poison inputs."""

from __future__ import annotations

import json

from otel_worker_spark.fixtures import (
    golden_trace_envelope,
    token_df_from_payloads,
    token_sequences_from_events,
)
from otel_worker_spark.parse import parse_token_sequences
from otel_worker_spark.parse_arrow import parse_token_sequences_arrow

SF_DIR = "/root/testdata/sf0.001"


def assert_engines_equal(df, with_inner=True):
    a = (
        parse_token_sequences(df, with_inner=with_inner)
        .toPandas()
        .sort_values(["doc_id", "span_id"], na_position="first")
        .reset_index(drop=True)
    )
    b = (
        parse_token_sequences_arrow(df, with_inner=with_inner)
        .toPandas()[a.columns]
        .sort_values(["doc_id", "span_id"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].astype(str), b[c].astype(str)
        assert av.equals(bv), (
            f"column {c} differs:\n sql:   {av[av != bv].head(3).tolist()}"
            f"\n arrow: {bv[av != bv].head(3).tolist()}"
        )


def test_engines_equal_golden(spark):
    assert_engines_equal(token_df_from_payloads(spark, [golden_trace_envelope()]))


def test_engines_equal_events_derived(spark):
    tok = token_sequences_from_events(spark, SF_DIR).limit(300)
    assert_engines_equal(tok)
    assert_engines_equal(tok, with_inner=False)


def test_engines_equal_poison(spark):
    good = json.dumps(golden_trace_envelope(), separators=(",", ":"))
    rows = [
        ("ok", list(good.encode())),
        ("oob", [300, -5]),
        ("bad_utf8", [255, 254, 128]),
        ("not_json", list(b"hello")),
        ("empty_env", list(b'{"resourceSpans":[]}')),
        ("no_spans", list(b'{"resourceSpans":[{"scopeSpans":[{"spans":[]}]}]}')),
        (
            "edge_attrs",
            list(
                json.dumps(
                    {
                        "resourceSpans": [
                            {
                                "scopeSpans": [
                                    {
                                        "spans": [
                                            {
                                                "traceId": "ab" * 16,
                                                "spanId": "cd" * 8,
                                                "name": "edge",
                                                "startTimeUnixNano": "1000000000",
                                                "endTimeUnixNano": "2000000000",
                                                "attributes": [
                                                    {"key": "d", "value": {"doubleValue": 1.5}},
                                                    {"key": "b", "value": {"boolValue": False}},
                                                    {
                                                        "key": "arr",
                                                        "value": {
                                                            "arrayValue": {
                                                                "values": [
                                                                    {"intValue": "1"},
                                                                    {"stringValue": "s"},
                                                                ]
                                                            }
                                                        },
                                                    },
                                                ],
                                                "events": [
                                                    {
                                                        "name": "e1",
                                                        "timeUnixNano": "1500000000",
                                                        "attributes": [
                                                            {"key": "k", "value": {"intValue": "9"}}
                                                        ],
                                                    }
                                                ],
                                                "links": [
                                                    {"traceId": "EF" * 16, "spanId": "01" * 8, "flags": 7}
                                                ],
                                                "status": {"code": 2, "message": "bad"},
                                            }
                                        ]
                                    }
                                ]
                            }
                        ]
                    }
                ).encode()
            ),
        ),
    ]
    df = spark.createDataFrame(
        [(n, t, len(t), "probe") for n, t in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_engines_equal(df)
