"""Streaming exact-dedup: first arrival of each digest is emitted
exactly once — across micro-batches AND across a query restart — and
the emitted digest set equals the batch ``dedup_exact`` grouping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from otel_worker_spark.streaming import dedup_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def doc_stream_dirs(tmp_path):
    src = tmp_path / "docs-in"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "dedup-out"
    os.makedirs(src)
    return str(src), str(ckpt), str(out)


def _with_ts(df):
    return df.withColumn("event_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))


def test_epoch_sink_is_replay_idempotent(spark, tmp_path):
    """A micro-batch replayed after a crash between the parquet write
    and the checkpoint commit re-delivers the same rows under the same
    epoch_id — the epoch-keyed overwrite sink must land them ONCE."""
    from otel_worker_spark.streaming import epoch_idempotent_sink

    out = str(tmp_path / "out")
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    land = epoch_idempotent_sink(out)
    land(df, 7)
    land(df, 7)  # the replay
    land(df.where("doc_id < 40"), 8)
    got = spark.read.parquet(out)
    assert got.count() == 140
    assert got.where("epoch = 7").count() == 100


def test_stream_lsh_near_dup_equals_batch(spark, tmp_path):
    """Incremental MinHash-LSH + exact verify over micro-batches must
    reproduce the batch ``verified_pairs`` EXACTLY on the same corpus:
    every unordered pair surfaces once, in the epoch where its later
    member arrives."""
    from otel_worker_spark.ops import dedup as dd
    from otel_worker_spark.streaming import lsh_dedup_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs-in")
    # three arrival waves → three micro-batches (near-dup pairs in the
    # fixture span waves, so cross-batch candidates are exercised)
    for lo, hi in ((0, 150), (150, 350), (350, 10**9)):
        _with_ts(docs.where(f"doc_id >= {lo} AND doc_id < {hi}")).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = lsh_dedup_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
        str(tmp_path / "pairs"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(str(tmp_path / "pairs"))
        .select("doc_a", "doc_b", "jaccard_m")
        .toPandas()
    )
    want = dd.verified_pairs(docs).toPandas()
    key = ["doc_a", "doc_b"]
    assert len(got) == len(got.drop_duplicates(key))  # each pair once
    a = got.sort_values(key).reset_index(drop=True).astype(str)
    b = want.sort_values(key).reset_index(drop=True).astype(str)
    assert len(a) == len(b) and a.equals(b)


def test_stream_dedup_across_batches_and_restart(spark, doc_stream_dirs):
    src, ckpt, out = doc_stream_dirs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # drop 1: first 300 docs
    first = docs.where("doc_id < 300")
    _with_ts(first).write.mode("append").parquet(src)
    q = dedup_stream(spark, src, ckpt, out)
    q.awaitTermination()
    out1 = spark.read.parquet(out).collect()

    # every emitted digest exactly once, and set == batch distinct set
    digests1 = [r.digest for r in out1]
    assert len(digests1) == len(set(digests1))
    expected1 = {
        r.d for r in first.select(F.md5("text").alias("d")).distinct().collect()
    }
    assert set(digests1) == expected1

    # drop 2 (fresh query on the same checkpoint = restart): the SAME
    # 300 docs again (all duplicates) plus 200 new ones
    _with_ts(first.withColumn("doc_id", F.col("doc_id") + 100000)).write.mode(
        "append"
    ).parquet(src)
    second_new = docs.where("doc_id >= 300")
    _with_ts(second_new).write.mode("append").parquet(src)
    q2 = dedup_stream(spark, src, ckpt, out)
    q2.awaitTermination()
    out2_all = spark.read.parquet(out).collect()
    seen1 = {r.digest for r in out1}
    out2 = [r for r in out2_all if r.digest not in seen1]
    assert len(out2_all) == len(out1) + len(out2)

    digests2 = [r.digest for r in out2]
    assert len(digests2) == len(set(digests2))
    # nothing already emitted in drop 1 re-emits; only genuinely new
    # digests appear (state survived the restart via the checkpoint)
    assert set(digests2).isdisjoint(expected1)
    expected_new = {
        r.d for r in second_new.select(F.md5("text").alias("d")).distinct().collect()
    } - expected1
    assert set(digests2) == expected_new

    # union across the stream == the batch dedup_exact digest set
    all_docs = first.unionByName(second_new)
    batch = {
        r.d for r in all_docs.select(F.md5("text").alias("d")).distinct().collect()
    }
    assert expected1 | expected_new == batch
