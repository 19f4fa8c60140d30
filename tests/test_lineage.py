"""Offset-table resume, per-partition lineage and ingest-rate metrics
(north rule: "resumable from a checkpointed offset table with
per-partition lineage and ingest-rate metrics")."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from otel_worker_spark.fixtures import service_lookup_df, token_sequences_from_events
from otel_worker_spark.lineage import OffsetLog, _batch_id_for, ingest_directory
from otel_worker_spark.pipeline import PipelineStores
from otel_worker_spark.streaming import start_ingest_stream

SF_DIR = "/root/testdata/sf0.001"


def _write_token_dir(spark, path: str, n_files: int = 6):
    tok = token_sequences_from_events(spark, SF_DIR)
    tok.repartition(n_files).write.mode("overwrite").parquet(path)
    return tok.count()


def test_ingest_directory_end_to_end(spark, tmp_root):
    src = os.path.join(tmp_root, "tokens")
    total = _write_token_dir(spark, src, n_files=6)
    stores = PipelineStores(spark, os.path.join(tmp_root, "stores"))
    offsets = OffsetLog(spark, os.path.join(tmp_root, "stores"))

    receipts = ingest_directory(
        spark, src, service_lookup_df(spark), stores, offsets, files_per_batch=2
    )
    assert len(receipts) == 3  # 6 files / 2 per batch
    assert stores.spans.read().count() == total

    # the offset table covers every input file exactly once
    odf = offsets.offsets_df()
    assert odf.count() == 6
    assert odf.select("input_file").distinct().count() == 6
    assert odf.agg(F.sum("rows")).collect()[0][0] == total

    # ingest-rate metrics: one row per batch, positive rate
    mdf = offsets.metrics_df()
    rows = {r["batch_id"]: r for r in mdf.collect()}
    assert len(rows) == 3
    assert all(r["rows_per_s"] > 0 for r in rows.values())
    assert sum(r["input_rows"] for r in rows.values()) == total

    # per-partition (per-sink) lineage: rows land attributed to sinks
    ldf = offsets.lineage_df()
    assert ldf.agg(F.sum("rows")).collect()[0][0] == total
    assert set(
        r["partition"] for r in ldf.select("partition").distinct().collect()
    ) >= {"traces"}


def test_ingest_directory_resumes_skipping_done_files(spark, tmp_root):
    src = os.path.join(tmp_root, "tokens")
    _write_token_dir(spark, src, n_files=4)
    stores = PipelineStores(spark, os.path.join(tmp_root, "stores"))
    offsets = OffsetLog(spark, os.path.join(tmp_root, "stores"))
    lookup = service_lookup_df(spark)

    first = ingest_directory(spark, src, lookup, stores, offsets, files_per_batch=2)
    assert len(first) == 2 and not any(r["skipped"] for r in first)
    total = stores.spans.read().count()

    # nothing new → zero batches launched
    again = ingest_directory(spark, src, lookup, stores, offsets, files_per_batch=2)
    assert again == []
    assert stores.spans.read().count() == total

    # drop new files in → only those are ingested
    extra_dir = os.path.join(tmp_root, "extra")
    n_extra = _write_token_dir(spark, extra_dir, n_files=2)
    for n in os.listdir(extra_dir):
        if n.endswith(".parquet"):
            os.rename(
                os.path.join(extra_dir, n), os.path.join(src, "new-" + n)
            )
    third = ingest_directory(spark, src, lookup, stores, offsets, files_per_batch=2)
    assert len(third) == 1 and third[0]["skipped"] is False
    assert stores.spans.read().count() == total + n_extra


def test_crash_between_data_and_offset_commit_repairs(spark, tmp_root):
    """Simulate dying after the spans commit but before the offset
    record: the retry must not duplicate rows and must record the
    offset as replayed."""
    src = os.path.join(tmp_root, "tokens")
    total = _write_token_dir(spark, src, n_files=2)
    stores = PipelineStores(spark, os.path.join(tmp_root, "stores"))
    offsets = OffsetLog(spark, os.path.join(tmp_root, "stores"))
    lookup = service_lookup_df(spark)

    # run the data commit exactly as ingest_directory would, but crash
    # before offsets.record
    from otel_worker_spark.lineage import _list_input_files
    from otel_worker_spark.pipeline import ingest_batch

    files = _list_input_files(src)
    bid = _batch_id_for(files)
    ingest_batch(spark, spark.read.parquet(*files), lookup, stores, bid)
    assert offsets.committed_files() == set()

    # retry: same deterministic batch id → store short-circuits,
    # offset recorded as replayed, zero duplicate rows
    receipts = ingest_directory(
        spark, src, lookup, stores, offsets, files_per_batch=len(files)
    )
    assert len(receipts) == 1
    assert receipts[0]["skipped"] is True
    assert receipts[0]["metrics"]["replayed"] is True
    assert stores.spans.read().count() == total
    assert offsets.committed_files() == set(files)


def test_crash_window_with_new_files_replays_same_batch(spark, tmp_root):
    """The nastier crash: after the data commit / before the offset
    record, NEW files land in the source dir. Regrouping the listing
    would shift chunk boundaries and give the crashed files a fresh
    batch_id (double-ingest); the durable intent pins the original
    (batch_id, file set) so the retry replays it verbatim."""
    src = os.path.join(tmp_root, "tokens")
    total = _write_token_dir(spark, src, n_files=2)
    stores = PipelineStores(spark, os.path.join(tmp_root, "stores"))
    offsets = OffsetLog(spark, os.path.join(tmp_root, "stores"))
    lookup = service_lookup_df(spark)

    from otel_worker_spark.lineage import _list_input_files
    from otel_worker_spark.pipeline import ingest_batch

    import pyarrow.parquet as pq

    files = _list_input_files(src)
    bid = _batch_id_for(files)
    input_files = [
        {"file": f, "rows": pq.ParquetFile(f).metadata.num_rows} for f in files
    ]
    # intent + data commit, then "crash" before offsets.record
    offsets.record_intent(bid, input_files)
    ingest_batch(spark, spark.read.parquet(*files), lookup, stores, bid)
    assert [i["batch_id"] for i in offsets.pending_intents()] == [bid]

    # new files land DURING the crash window, sorting BEFORE the old
    # ones — the regrouping trap
    extra_dir = os.path.join(tmp_root, "extra")
    n_extra = _write_token_dir(spark, extra_dir, n_files=1)
    for n in os.listdir(extra_dir):
        if n.endswith(".parquet"):
            os.rename(os.path.join(extra_dir, n), os.path.join(src, "aaa-" + n))

    receipts = ingest_directory(
        spark, src, lookup, stores, offsets, files_per_batch=2
    )
    # one replayed (the intent), one fresh (the new file); zero dupes
    assert len(receipts) == 2
    assert receipts[0]["skipped"] is True
    assert receipts[0]["metrics"]["replayed"] is True
    assert receipts[1]["skipped"] is False
    assert stores.spans.read().count() == total + n_extra
    assert offsets.pending_intents() == []
    assert offsets.committed_files() == set(_list_input_files(src))


def test_streaming_records_rate_metrics(spark, tmp_root):
    src = os.path.join(tmp_root, "tokens")
    total = _write_token_dir(spark, src, n_files=4)
    stores = PipelineStores(spark, os.path.join(tmp_root, "stores"))
    offsets = OffsetLog(spark, os.path.join(tmp_root, "stores"))
    q = start_ingest_stream(
        spark,
        src,
        service_lookup_df(spark),
        stores,
        checkpoint_dir=os.path.join(tmp_root, "ckpt"),
        max_files_per_trigger=2,
        offsets=offsets,
    )
    q.awaitTermination(120)
    mdf = offsets.metrics_df()
    got = mdf.agg(F.sum("input_rows")).collect()[0][0]
    assert got == total
    assert all(r["rows_per_s"] > 0 for r in mdf.collect())


def test_offset_log_not_fully_reread_per_epoch(spark, tmp_root, monkeypatch):
    """VERDICT r3 item 3: the streaming per-epoch committed check must
    not re-read the whole offset log every micro-batch. Counted by
    monkeypatching open(): same-process epochs cost ZERO log reads
    (record() pre-caches its own publish), and a fresh process reads
    each log file AT MOST ONCE across all epochs, not once per epoch."""
    import builtins

    log = OffsetLog(spark, os.path.join(tmp_root, "stores"))
    for i in range(10):
        log.record(str(i), [], 0.1, rows=1)

    reads: list[str] = []
    real_open = builtins.open

    def counting_open(path, mode="r", *a, **k):
        if str(path).startswith(log.log_dir) and "w" not in mode:
            reads.append(str(path))
        return real_open(path, mode, *a, **k)

    monkeypatch.setattr(builtins, "open", counting_open)

    # same-process stream loop: miss → record → hit, 10 epochs
    for i in range(10, 20):
        assert not log.has_batch(str(i))
        log.record(str(i), [], 0.1, rows=1)
        assert log.has_batch(str(i))
    assert reads == [], f"same-process epochs re-read the log: {reads}"

    # fresh process (new OffsetLog): 20 files on disk, 10 more epochs —
    # every file parsed at most once in total (old behavior: 10 × ~25)
    log2 = OffsetLog(spark, log.root)
    for i in range(20, 30):
        assert not log2.has_batch(str(i))
        log2.record(str(i), [], 0.1, rows=1)
        assert log2.has_batch(str(i))
    assert len(reads) == len(set(reads)), "a log file was read twice"
    assert len(reads) == 20
