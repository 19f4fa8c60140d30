"""Streaming ANN serving over the persisted index: micro-batched
query vectors must produce EXACTLY the one-shot serve results (the
index is the static side; batching must not change any answer), and
the epoch-keyed TableStore sink must be replay-idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from otel_worker_spark.ops import ann_index as ai
from otel_worker_spark.store import TableStore
from otel_worker_spark.streaming import ann_serve_stream

SF_DIR = "/root/testdata/sf0.001"


def test_stream_serve_equals_batch_serve(spark, tmp_path):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index_root = str(tmp_path / "ivfpq")
    ai.build_ivfpq_index(embs, index_root)

    # two arrival waves of query vectors → two micro-batches
    src = str(tmp_path / "queries-in")
    os.makedirs(src)
    embs.where("vec_id < 4").select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    embs.where("vec_id >= 4 AND vec_id < 9").select(
        "vec_id", "embedding"
    ).coalesce(1).write.mode("append").parquet(src)

    q = ann_serve_stream(
        spark,
        src,
        index_root,
        results_root=str(tmp_path / "results"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=3,
    )
    q.awaitTermination(300)

    results = TableStore(spark, str(tmp_path / "results"))
    got = sorted(
        (r.vec_id, r.rank, r.neighbor_id, r.adc_d2_u)
        for r in results.read().collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adc_d2_u)
        for r in ai.ivfpq_serve_queries(
            embs.where("vec_id < 9").select("vec_id", "embedding"),
            index_root,
            k=3,
        ).collect()
    )
    assert got == want and len(got) == 9 * 3

    # replaying an epoch is a no-op (idempotent-by-batch TableStore)
    batch = embs.where("vec_id < 4").select("vec_id", "embedding")
    out = ai.ivfpq_serve_queries(batch, index_root, k=3).withColumnRenamed(
        "query_id", "vec_id"
    )
    receipt = results.append(out, batch_id=0)
    assert receipt["skipped"]
    assert results.read().count() == 27
