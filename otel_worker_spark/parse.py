"""The parse stage: token sequences → flat, typed span rows.

Reference semantics being reproduced (SURVEY.md §2.2):

- P1  triple-nested flatten ``resourceSpans[] × scopeSpans[] × spans[]``
      with resource/scope context copied onto every span
      (``Span::from_collector_request``, otel.rs:49-118) — expressed as
      an ``explode_outer`` chain (Spark's lateral view; the correlated
      flatten replicates the parent columns per row for free);
- P2  nanos → timestamp (otel.rs:12-17) — invalid values become null +
      quarantine instead of the reference's panic;
- P3/P15 hex ids, lowercased + validated (data/models.rs:82-213);
- P4  empty parentSpanId → NULL (otel.rs:75-79);
- P5/P6 enum decodes (kind / status code) with the reference's exact
      strings; missing kind defaults to ``Unspecified``
      (data/models.rs:58: ``kind.unwrap_or_default()``);
- P7/P8 attribute maps: key-sorted, values as untagged JSON strings;
- P9/P10 event / link normalization via ``transform`` HOFs;
- P11/P12 the ``inner`` JSON column (full span as JSON text);
- P14 id extraction is a plain ``select`` on the parsed frame.

Everything after the detokenize pandas UDF is built-in Catalyst
expressions (whole-stage codegen); ``from_json`` does the heavy
lifting JVM-side. Invalid rows (bad UTF-8, malformed JSON, bad hex,
out-of-range times) carry ``is_valid=false`` + a reason instead of
failing the batch, and ``split_quarantine`` routes them to a
quarantine sink — at 100 TB a single poison payload must not kill the
job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import ANYVALUE_DEPTH, SPAN_KINDS, STATUS_CODES, otlp_envelope_schema
from .serialize import attrs_to_map, span_inner_json
from .tokens import detokenize_expr, detokenize_udf

HEX_RE = r"^([0-9a-f]{2})+$"

#: longs beyond ~year 2262 overflow i64 nanos; treat as invalid (P2)
MAX_UNIX_NANOS = 9_223_372_036_854_775_807


def _kind_expr(kind: Column) -> Column:
    """Proto int → enum string; null/unknown → Unspecified (P5, P11)."""
    m = F.create_map(*[F.lit(x) for kv in SPAN_KINDS.items() for x in kv])
    return F.coalesce(m[kind], F.lit("Unspecified"))


def _status_expr(status: Column) -> Column:
    """Proto int → {Unset,Ok,Error} (P6). A status object WITHOUT a
    code still decodes to Unset — proto3 defaults the missing field to
    0/Unset and the reference's ``Status::code()`` does the same — so
    the branch is on the status STRUCT being present, not the code.
    Unknown ints also map to Unset. No status object at all → NULL."""
    m = F.create_map(*[F.lit(x) for kv in STATUS_CODES.items() for x in kv])
    return F.when(status.isNotNull(), F.coalesce(m[status["code"]], F.lit("Unset")))


def _nanos_to_ts(nanos_str: Column) -> Column:
    """Decimal-string unix nanos → TimestampType (µs precision) (P2).

    ``try_cast`` so an out-of-i64-range value (where the reference
    panics, otel.rs:15) nulls out and quarantines instead of killing
    the job under ANSI mode. The ns→µs step divides as DECIMAL, not
    DOUBLE: epoch nanos ≈ 1.7e18 exceed a double's 53-bit exact
    integer range, and float division here silently perturbs
    timestamps by ±1 µs.
    """
    ns = nanos_str.try_cast("long")
    us = F.floor(ns.cast("decimal(30,0)") / 1000).try_cast("long")
    return F.timestamp_micros(us)


def _hex_id(c: Column) -> Column:
    """Lowercase + empty→null (P3/P4); validity checked separately."""
    lowered = F.lower(c)
    return F.when(F.length(lowered) > 0, lowered)


def _payload_bin() -> Column:
    """The carried payload bytes: re-encode the decoded string on the
    happy path (UTF-8 round-trip is exact); on decode failure,
    reconstruct the raw bytes from the token array (hex → unhex) when
    every token is a byte — matching the Arrow engine exactly."""
    raw = F.unhex(
        F.concat_ws("", F.transform(F.col("tokens"), lambda t: F.lpad(F.hex(t), 2, "0")))
    )
    return F.when(
        F.col("_payload").isNotNull(), F.encode("_payload", "UTF-8")
    ).otherwise(
        F.when(F.expr("forall(tokens, t -> t >= 0 AND t <= 255)"), raw)
    )


def parse_token_sequences(
    df: DataFrame,
    depth: int = ANYVALUE_DEPTH,
    detokenizer: str = "pandas",
    with_inner: bool = True,
) -> DataFrame:
    """token_sequences(doc_id, tokens, n_tok, source) → flat span rows.

    Returns one row per wire span (plus one all-null-span row per
    undecodable sequence, flagged ``is_valid=false``) with the columns
    of ``schemas.SPAN_SINK_COLUMNS`` + ``is_valid`` + ``invalid_reason``.
    The exact input bytes are carried through as ``payload`` BINARY
    (token-array equality ⇔ payload byte equality under the identity
    byte vocab) — a binary cell crosses stage boundaries ~25× cheaper
    than the equivalent ``array<int>`` (see parse_arrow docstring);
    only out-of-vocab quarantine rows (tokens outside 0..255) carry a
    NULL payload, as no byte string can represent them.
    """
    detok = detokenize_udf(F.col("tokens")) if detokenizer == "pandas" else detokenize_expr("tokens")
    env_schema = otlp_envelope_schema(depth)

    parsed = (
        df.withColumn("_payload", detok)
        .withColumn("_env", F.from_json("_payload", env_schema))
        # P1: the triple flatten. explode_outer keeps undecodable rows
        # (null envelope) so they can be quarantined downstream.
        .select("*", F.explode_outer("_env.resourceSpans").alias("_rs"))
        .select("*", F.explode_outer("_rs.scopeSpans").alias("_ss"))
        .select("*", F.explode_outer("_ss.spans").alias("_sp"))
    )

    sp = F.col("_sp")
    resource_attrs = attrs_to_map(F.col("_rs.resource.attributes"), depth)
    scope_attrs = attrs_to_map(F.col("_ss.scope.attributes"), depth)
    span_attrs = attrs_to_map(sp["attributes"], depth)

    events = F.transform(
        sp["events"],
        lambda e: F.struct(
            e["name"].alias("name"),
            _nanos_to_ts(e["timeUnixNano"]).alias("timestamp"),
            attrs_to_map(e["attributes"], depth).alias("attributes"),
        ),
    )
    links = F.transform(
        sp["links"],
        lambda li: F.struct(
            _hex_id(li["traceId"]).alias("trace_id"),
            _hex_id(li["spanId"]).alias("span_id"),
            li["traceState"].alias("trace_state"),
            attrs_to_map(li["attributes"], depth).alias("attributes"),
            li["flags"].alias("flags"),
        ),
    )

    # Routing keys extracted from the RAW parsed arrays, not the
    # JSON-encoded maps: CollapseProject would otherwise inline
    # (= recompute) the entire attrs_to_map expression per consumer.
    # LAST match wins on duplicate keys (BTreeMap insert semantics,
    # same as the Arrow engine's dict build); try_element_at(-1) is
    # the ANSI-safe "last element or null" accessor.
    severity = F.try_element_at(
        F.filter(sp["attributes"], lambda kv: kv["key"] == F.lit("severity")), F.lit(-1)
    )["value"]["stringValue"]
    service_name = F.try_element_at(
        F.filter(
            F.col("_rs.resource.attributes"), lambda kv: kv["key"] == F.lit("service.name")
        ),
        F.lit(-1),
    )["value"]["stringValue"]

    out = parsed.select(
        _hex_id(sp["traceId"]).alias("trace_id"),
        _hex_id(sp["spanId"]).alias("span_id"),
        _hex_id(sp["parentSpanId"]).alias("parent_span_id"),
        sp["name"].alias("name"),
        _kind_expr(sp["kind"]).alias("kind"),
        _nanos_to_ts(sp["startTimeUnixNano"]).alias("start_time"),
        _nanos_to_ts(sp["endTimeUnixNano"]).alias("end_time"),
        sp["traceState"].alias("trace_state"),
        sp["flags"].alias("flags"),
        F.col("_ss.scope.name").alias("scope_name"),
        F.col("_ss.scope.version").alias("scope_version"),
        _status_expr(sp["status"]).alias("status_code"),
        sp["status"]["message"].alias("status_message"),
        span_attrs.alias("attributes"),
        scope_attrs.alias("scope_attributes"),
        resource_attrs.alias("resource_attributes"),
        events.alias("events"),
        links.alias("links"),
        severity.alias("severity"),
        service_name.alias("service_name"),
        F.col("doc_id"),
        _payload_bin().alias("payload"),
        F.col("n_tok"),
        F.col("source"),
        F.isnull("_env").alias("_decode_failed"),
    )

    invalid_reason = (
        F.when(F.col("_decode_failed"), F.lit("undecodable_payload"))
        .when(F.col("trace_id").isNull() | ~F.col("trace_id").rlike(HEX_RE), F.lit("invalid_trace_id"))
        .when(F.col("span_id").isNull() | ~F.col("span_id").rlike(HEX_RE), F.lit("invalid_span_id"))
        .when(F.col("parent_span_id").isNotNull() & ~F.col("parent_span_id").rlike(HEX_RE), F.lit("invalid_parent_span_id"))
        .when(F.col("name").isNull(), F.lit("missing_name"))
        .when(F.col("start_time").isNull() | F.col("end_time").isNull(), F.lit("invalid_time"))
    )
    out = (
        out.withColumn("invalid_reason", invalid_reason)
        .withColumn("is_valid", invalid_reason.isNull())
        .drop("_decode_failed")
    )

    if with_inner:
        cols = {name: F.col(name) for name in out.columns}
        out = out.withColumn(
            "inner", F.when(F.col("is_valid"), span_inner_json(cols))
        )
    else:
        out = out.withColumn("inner", F.lit(None).cast("string"))
    return out


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid spans, quarantined rows). Lazy — no action triggered.

    The reference 422s the whole request on a bad payload
    (handlers/otel.rs:25-28 → ApiServerError); at scale we instead
    quarantine per-row and keep the batch flowing.
    """
    good = parsed.filter(F.col("is_valid")).drop("is_valid", "invalid_reason")
    bad = parsed.filter(~F.col("is_valid")).drop("is_valid")
    return good, bad


def extract_trace_ids(parsed: DataFrame) -> DataFrame:
    """P14: all (trace_id, span_id) pairs for the SpanAdded broadcast
    (``Service::extract_trace_ids``, service.rs:60-74) — a reuse of the
    parsed frame, not a second walk of the envelope."""
    return parsed.select("trace_id", "span_id")
