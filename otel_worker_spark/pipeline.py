"""The end-to-end ingest pipeline: parse → enrich → route → sinks.

One micro-batch = one ``ingest_batch`` call (the reference's
``Service::ingest_export``, service.rs:32-54, set-oriented). The
batch is processed in exactly TWO Spark jobs:

1. one partitioned write that lands every signal sink, the quarantine
   rows and the SpanAdded manifest columns in a single pass (the
   routed frame is persisted so parse runs once);
2. one aggregate for the per-sink receipts.

All appends are idempotent by batch_id (see store.TableStore), so a
restarted stream replays safely — the real version of the atomicity
the reference only fakes (M3, data.rs:43-48).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .enrich import enrich_spans
from .parse import parse_token_sequences
from .route import signal_expr, sink_receipts, span_added_manifest
from .store import TableStore


def _append_receipts_and_manifest(
    stores: PipelineStores, live: DataFrame, batch_id: str | int
) -> None:
    """Land the two downstream tables of a committed spans batch.

    The appends are independent (different tables, both derived from
    the already-written batch files), so they run from a 2-thread pool
    (guide §2.6): Spark schedules both jobs at once and the second
    append's tasks back-fill the first's tail instead of waiting for
    it — measured ~0.82 s sequential → ~0.5 s overlapped at sf0.1.
    Each append stays idempotent by batch_id, so crash/replay
    semantics are unchanged regardless of which lands first.
    """
    receipts = sink_receipts(live, batch_id)
    manifest = span_added_manifest(live, batch_id)
    with ThreadPoolExecutor(max_workers=2) as pool:
        fr = pool.submit(stores.receipts.append, receipts, batch_id)
        fm = pool.submit(stores.manifest.append, manifest, batch_id)
        fr.result()
        fm.result()


class PipelineStores:
    """The table set of one deployment (FIXTURES.md §5)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spans = TableStore(spark, f"{root}/spans")          # routed, partitioned by signal
        self.quarantine = TableStore(spark, f"{root}/quarantine")
        self.receipts = TableStore(spark, f"{root}/sink_receipts")
        self.manifest = TableStore(spark, f"{root}/span_added_manifest")

    def sink(self, signal: str) -> DataFrame:
        """Per-signal sink view (file-level pruned)."""
        return self.spans.read(partition=signal)


#: canonical column order for routed span frames (any parse engine)
CANON_COLS = [
    "trace_id", "span_id", "parent_span_id", "name", "kind", "start_time",
    "end_time", "trace_state", "flags", "scope_name", "scope_version",
    "status_code", "status_message", "attributes", "scope_attributes",
    "resource_attributes", "events", "links", "severity", "service_name",
    "doc_id", "payload", "n_tok", "source", "invalid_reason", "inner",
    "team", "tier", "service_environment", "signal",
]


#: columns the routing/enrich/quarantine stages themselves consume
_ROUTING_COLS = {
    "name", "severity", "service_name", "is_valid", "invalid_reason",
    "doc_id", "n_tok", "source",
}


def transform_batch(
    token_df: DataFrame,
    service_lookup: DataFrame,
    depth: int = 3,
    with_inner: bool = True,
    engine: str = "arrow",
    columns: list[str] | None = None,
) -> DataFrame:
    """The pure transformation: token sequences → routed span rows
    (+ quarantine rows flagged by is_valid). No I/O, reusable by
    batch jobs, the streaming wrapper, and tests alike — the
    reference's one-engine/thin-adapters shape (SURVEY §3.3).

    ``engine`` picks the parse implementation: ``"arrow"`` (default —
    the mapInArrow kernel, measured faster, see bench.py), ``"sql"``
    (the pure-Catalyst declarative plan), or ``"protobuf"`` (S2: the
    token bytes are ExportTraceServiceRequest wire format instead of
    OTLP/JSON — same walker, same output contract). arrow/sql produce
    identical frames (tests/test_parse_engines.py).

    ``with_inner=False`` skips building the ``inner`` JSON column for
    read paths that don't need it (column pruning can't elide a
    projected expression)."""
    if columns is not None:
        columns = sorted(set(columns) | _ROUTING_COLS)
    if engine == "arrow":
        from .parse_arrow import parse_token_sequences_arrow

        parsed = parse_token_sequences_arrow(
            token_df, with_inner=with_inner, columns=columns
        )
    elif engine == "protobuf":
        from .proto import parse_token_sequences_protobuf

        parsed = parse_token_sequences_protobuf(
            token_df, with_inner=with_inner, columns=columns
        )
    else:
        parsed = parse_token_sequences(token_df, depth=depth, with_inner=with_inner)
        if columns is not None:
            parsed = parsed.select(*[c for c in parsed.columns if c in set(columns)])
    enriched = enrich_spans(parsed, service_lookup)
    routed = enriched.withColumn(
        "signal",
        F.when(~F.col("is_valid"), F.lit("quarantine")).otherwise(signal_expr()),
    ).drop("is_valid")
    return routed.select(*[c for c in CANON_COLS if c in routed.columns])


def ingest_batch(
    spark: SparkSession,
    token_df: DataFrame,
    service_lookup: DataFrame,
    stores: PipelineStores,
    batch_id: str | int,
) -> dict:
    """Process one micro-batch end-to-end. Returns the batch receipt
    (per-sink counts — the ExportTraceServiceResponse analog)."""
    committed = stores.spans.committed_batches()
    if str(batch_id) in committed:
        # Replay after restart: exactly-once, return the original
        # receipt — but first REPAIR the two downstream stores. If the
        # process died after the spans commit and before the receipts/
        # manifest commits, those rows would otherwise be lost forever
        # behind this early return. Each append is idempotent by
        # batch_id, so the repair is a no-op when they already landed,
        # and the check below avoids even launching the jobs then.
        bid = str(batch_id)
        if (
            bid not in stores.receipts.committed_batches()
            or bid not in stores.manifest.committed_batches()
        ):
            routed = stores.spans.read_batch(bid)
            if routed is not None:
                live = routed.filter(F.col("signal") != "quarantine")
                _append_receipts_and_manifest(stores, live, batch_id)
        return {**committed[bid], "skipped": True}

    routed = transform_batch(token_df, service_lookup)
    receipt = stores.spans.append(routed, batch_id, partition_by="signal")
    # receipts/manifest read the JUST-WRITTEN batch files instead of a
    # persisted copy of the wide routed frame (r7: the persist
    # serialized every attribute map/event array into block storage
    # purely to feed two narrow aggregates — the parquet read-back
    # column-prunes to (n_tok) and (trace_id, span_id) and is the
    # exact path the crash-repair replay below already takes, so the
    # emitted rows are identical by construction).
    written = stores.spans.read_batch(str(batch_id))
    live = written.filter(F.col("signal") != "quarantine")
    _append_receipts_and_manifest(stores, live, batch_id)
    return {**receipt, "skipped": False}
