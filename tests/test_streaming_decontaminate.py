"""Streaming benchmark decontamination: the per-micro-batch
stream-static probe must reproduce the batch ``token_decontaminate``
EXACTLY on the same corpus (same counts, same flags), across multiple
micro-batches, landing through the epoch-idempotent sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_worker_spark.fixtures import token_sequences_from_events
from otel_worker_spark.ops import token_stats as tks
from otel_worker_spark.streaming import decontaminate_stream

SF_DIR = "/root/testdata/sf0.001"

EID = "CAST(substr(doc_id, 5) AS BIGINT)"


def _triples(df):
    return {
        r["doc_id"]: (r["n_windows"], r["n_hits"], r["contaminated"])
        for r in df.collect()
    }


def test_stream_decontaminate_equals_batch(spark, tmp_path):
    tok = token_sequences_from_events(spark, SF_DIR).persist()
    try:
        bench_docs = tok.where(F.expr(f"{EID} % {tks.DECON_MOD} = 0"))
        corpus = tok.where(F.expr(f"{EID} % {tks.DECON_MOD} != 0"))

        bench_dir = str(tmp_path / "bench-grams")
        tks.benchmark_grams(bench_docs).write.parquet(bench_dir)

        # two arrival waves → two micro-batches (maxFilesPerTrigger=1),
        # so the static probe side is reused across epochs
        src = str(tmp_path / "tok-in")
        for pred in (f"{EID} % 2 = 0", f"{EID} % 2 = 1"):
            corpus.where(pred).coalesce(1).write.mode("append").parquet(src)

        out = str(tmp_path / "decon-out")
        q = decontaminate_stream(
            spark,
            src,
            str(tmp_path / "ckpt"),
            out,
            bench_dir,
            max_files_per_trigger=1,
        )
        q.awaitTermination(300)

        landed = spark.read.parquet(out)
        assert landed.select("epoch").distinct().count() >= 2
        got = _triples(landed.drop("epoch"))
        want = _triples(tks.token_decontaminate(tok))
        assert got == want
        # the fixture payloads share long literal JSON scaffolding with
        # the benchmark docs, so contamination must actually fire
        assert any(c for (_, _, c) in got.values())
    finally:
        tok.unpersist()
