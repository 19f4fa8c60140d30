"""JSON (de)serialization expressions — all JVM-side, codegen-friendly.

The reference stores anything complex as JSON text (``Json<T>``,
otel-worker-core/src/data/util.rs:7-103) and its attribute values are a
recursive untagged sum type whose serialized form is plain JSON
scalars/arrays/objects (``AttributeValue``, otel-worker-core/src/api/
models/otel.rs:257-292, golden test at 320-384). We reproduce that as
*string columns holding JSON*, produced entirely with built-in
functions (no Python in the hot path):

- ``anyvalue_to_json`` — OTLP/JSON ``AnyValue`` struct → the API's
  untagged JSON encoding ("x" / 123 / 1.5 / true / [..] / {..} /
  [bytes as number array]), recursion unrolled to the schema depth;
- ``attrs_to_map`` — attribute list → ``map<string, json-string>``
  with entries sorted by key (the reference's ``AttributeMap`` is a
  BTreeMap, otel.rs:232-255 — key order is deterministic);
- ``map_to_json`` / ``span_inner_json`` — rebuild the ``inner``
  column (full span as JSON text, data/models.rs:47-71) without
  re-quoting the already-JSON map values (which ``to_json`` would do).

Timestamps in ``inner`` are RFC3339 UTC with fixed microsecond
precision (Spark's native resolution); the reference prints
nanoseconds via the ``time`` crate but itself acknowledges sub-second
loss through its f64 storage round-trip
(otel-worker-cli/src/data/tests.rs:53-55).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .schemas import ANYVALUE_DEPTH

RFC3339_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def json_quote(c: Column) -> Column:
    """String → JSON string literal.

    Hot-path implementation: chained literal ``replace`` for the five
    escapes that occur in practice (backslash first), an order of
    magnitude cheaper than spinning a Jackson generator per value
    (``to_json``) plus a regexp. Control characters below U+0020 other
    than \\t \\n \\r are passed through un-escaped — technically
    invalid JSON, never produced by OTLP text fields; the Arrow parse
    engine (json.dumps) covers them exactly."""
    s = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    s = F.replace(s, F.lit('"'), F.lit('\\"'))
    s = F.replace(s, F.lit("\n"), F.lit("\\n"))
    s = F.replace(s, F.lit("\r"), F.lit("\\r"))
    s = F.replace(s, F.lit("\t"), F.lit("\\t"))
    return F.concat(F.lit('"'), s, F.lit('"'))


def json_number(c: Column) -> Column:
    """Numeric column → canonical JSON number text (Jackson formatting)."""
    j = F.to_json(F.array(c))
    return F.regexp_replace(j, r"^\[|\]$", "")


def json_unquote(c: Column) -> Column:
    """JSON value string → plain string (unquote + unescape scalars)."""
    return F.get_json_object(F.concat(F.lit('{"v":'), c, F.lit("}")), "$.v")


def _bytes_b64_to_json_array(c: Column) -> Column:
    """base64 → JSON array of byte numbers (serde's Vec<u8> encoding).

    ``try_to_binary`` nulls invalid base64 instead of raising under
    ANSI mode; the outer ``when`` keeps that null a NULL (concat_ws
    would silently swallow it into "[]") so the caller's coalesce can
    emit JSON ``null`` — the Arrow engine's decoder mirrors Spark's
    lenient alphabet/padding rules exactly."""
    bin_ = F.try_to_binary(c, F.lit("base64"))
    pairs = F.split(F.hex(bin_), r"(?<=\G..)")
    pairs = F.filter(pairs, lambda p: p != F.lit(""))
    nums = F.transform(pairs, lambda p: F.conv(p, 16, 10))
    return F.when(
        bin_.isNotNull(), F.concat(F.lit("["), F.concat_ws(",", nums), F.lit("]"))
    )


def anyvalue_to_json(v: Column, depth: int = ANYVALUE_DEPTH) -> Column:
    """OTLP ``AnyValue`` struct column → API JSON value string.

    Mirrors ``impl From<any_value::Value> for AttributeValue``
    (otel.rs:269-292): protobuf-JSON ``intValue`` strings become JSON
    numbers, arrays/kvlists recurse, kvlist keys are sorted (BTreeMap).
    """
    branches = F.when(v["stringValue"].isNotNull(), json_quote(v["stringValue"]))
    branches = branches.when(v["boolValue"].isNotNull(), v["boolValue"].cast("string"))
    # intValue is a decimal string on the wire; an uncastable value must
    # still terminate THIS branch (emit JSON null) rather than fall
    # through — and try_cast keeps ANSI mode from aborting the job on a
    # poison payload (the Arrow engine emits null for the same input).
    branches = branches.when(
        v["intValue"].isNotNull(),
        F.coalesce(v["intValue"].try_cast("long").cast("string"), F.lit("null")),
    )
    branches = branches.when(v["doubleValue"].isNotNull(), json_number(v["doubleValue"]))
    branches = branches.when(
        v["bytesValue"].isNotNull(),
        F.coalesce(_bytes_b64_to_json_array(v["bytesValue"]), F.lit("null")),
    )
    if depth > 1:
        arr = v["arrayValue"]["values"]
        branches = branches.when(
            arr.isNotNull(),
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.transform(arr, lambda x: anyvalue_to_json(x, depth - 1))),
                F.lit("]"),
            ),
        )
        kvs = v["kvlistValue"]["values"]
        branches = branches.when(
            kvs.isNotNull(),
            F.concat(
                F.lit("{"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(kvs),
                        lambda kv: F.concat(
                            json_quote(kv["key"]),
                            F.lit(":"),
                            anyvalue_to_json(kv["value"], depth - 1),
                        ),
                    ),
                ),
                F.lit("}"),
            ),
        )
    return branches.otherwise(F.lit("null"))


def attrs_to_map(attrs: Column, depth: int = ANYVALUE_DEPTH) -> Column:
    """``array<struct<key,value>>`` → key-sorted ``map<string,string>``
    whose values are JSON encodings (P7/P8 in SURVEY §2.2).

    ``array_sort`` on (key, input-index) structs sorts by ``key`` first
    (struct ordering is field-by-field) with the ORIGINAL position as
    tiebreak, reproducing BTreeMap iteration order AND its
    last-insert-wins duplicate-key semantics under the session's
    ``mapKeyDedupPolicy=LAST_WIN`` (the Arrow engine's dict insert
    behaves identically). Entries with a null key are dropped — a map
    key cannot be null, and both engines agree on the drop.
    """
    entries = F.filter(
        F.transform(
            attrs,
            lambda kv, i: F.struct(
                kv["key"].alias("key"),
                i.alias("idx"),
                anyvalue_to_json(kv["value"], depth).alias("value"),
            ),
        ),
        lambda e: e["key"].isNotNull(),
    )
    sorted_entries = F.transform(
        F.array_sort(entries),
        lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")),
    )
    return F.map_from_entries(sorted_entries)


def map_to_json(m: Column) -> Column:
    """map<string, json-string> → JSON object text, values verbatim."""
    entries = F.transform(
        F.map_entries(m),
        lambda e: F.concat(json_quote(e["key"]), F.lit(":"), e["value"]),
    )
    return F.when(
        m.isNotNull(), F.concat(F.lit("{"), F.concat_ws(",", entries), F.lit("}"))
    )


def rfc3339(ts: Column) -> Column:
    return F.date_format(ts, RFC3339_MICROS)


def _opt(field_json: Column) -> Column:
    """null-safe fragment: empty string when the value is null."""
    return F.coalesce(field_json, F.lit(""))


def _field(name: str, value_json: Column, *, leading_comma: bool = True) -> Column:
    frag = F.concat(
        F.lit(("," if leading_comma else "") + f'"{name}":'), value_json
    )
    return F.when(value_json.isNotNull(), frag).otherwise(F.lit(""))


def span_inner_json(df_cols: dict[str, Column]) -> Column:
    """Rebuild the ``inner`` column: the full API span as JSON text
    (the role of From<api::models::Span> for data Span,
    data/models.rs:47-71).

    Field order is fixed (struct declaration order); optional fields
    are omitted when null; attribute maps are key-sorted (BTreeMap
    parity). NOTE — deliberate re-design, not byte parity with the
    reference's serde output: we emit OTLP/JSON-style camelCase field
    names, omit None options entirely (serde writes explicit nulls for
    some), and store the status code as its enum STRING ("Ok"), where
    serde keeps the numeric proto code. The reference's inner blob is
    an internal storage detail it parses back itself; ours is chosen to
    round-trip through the same OTLP/JSON vocabulary the wire uses.
    Both parse engines produce this format byte-identically.
    """
    c = df_cols

    def ev_json(e: Column) -> Column:
        return F.concat(
            F.lit('{"name":'),
            json_quote(e["name"]),
            F.lit(',"timestamp":'),
            json_quote(rfc3339(e["timestamp"])),
            F.lit(',"attributes":'),
            F.coalesce(map_to_json(e["attributes"]), F.lit("{}")),
            F.lit("}"),
        )

    def link_json(li: Column) -> Column:
        return F.concat(
            F.lit('{"traceId":'),
            json_quote(li["trace_id"]),
            F.lit(',"spanId":'),
            json_quote(li["span_id"]),
            _field("traceState", F.when(li["trace_state"].isNotNull(), json_quote(li["trace_state"]))),
            F.lit(',"attributes":'),
            F.coalesce(map_to_json(li["attributes"]), F.lit("{}")),
            _field("flags", F.when(li["flags"].isNotNull(), li["flags"].cast("string"))),
            F.lit("}"),
        )

    status_json = F.when(
        c["status_code"].isNotNull(),
        F.concat(
            F.lit('{"code":'),
            json_quote(c["status_code"]),
            _field("message", F.when(c["status_message"].isNotNull(), json_quote(c["status_message"]))),
            F.lit("}"),
        ),
    )

    return F.concat(
        F.lit('{"traceId":'),
        json_quote(c["trace_id"]),
        F.lit(',"spanId":'),
        json_quote(c["span_id"]),
        _field("parentSpanId", F.when(c["parent_span_id"].isNotNull(), json_quote(c["parent_span_id"]))),
        F.lit(',"name":'),
        json_quote(c["name"]),
        _field("traceState", F.when(c["trace_state"].isNotNull(), json_quote(c["trace_state"]))),
        _field("flags", F.when(c["flags"].isNotNull(), c["flags"].cast("string"))),
        _field("kind", F.when(c["kind"].isNotNull(), json_quote(c["kind"]))),
        _field("scopeName", F.when(c["scope_name"].isNotNull(), json_quote(c["scope_name"]))),
        _field("scopeVersion", F.when(c["scope_version"].isNotNull(), json_quote(c["scope_version"]))),
        F.lit(',"startTime":'),
        json_quote(rfc3339(c["start_time"])),
        F.lit(',"endTime":'),
        json_quote(rfc3339(c["end_time"])),
        F.lit(',"attributes":'),
        F.coalesce(map_to_json(c["attributes"]), F.lit("{}")),
        _field("scopeAttributes", map_to_json(c["scope_attributes"])),
        _field("resourceAttributes", map_to_json(c["resource_attributes"])),
        _field("status", status_json),
        _field(
            "events",
            F.when(
                c["events"].isNotNull(),
                F.concat(
                    F.lit("["), F.concat_ws(",", F.transform(c["events"], ev_json)), F.lit("]")
                ),
            ),
        ),
        _field(
            "links",
            F.when(
                c["links"].isNotNull(),
                F.concat(
                    F.lit("["), F.concat_ws(",", F.transform(c["links"], link_json)), F.lit("]")
                ),
            ),
        ),
        F.lit("}"),
    )
