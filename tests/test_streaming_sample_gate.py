"""Streaming mixture sampling: the per-micro-batch stream-static gate
must land EXACTLY the batch ``apply_sample_gate`` decisions for the
same frozen rate table, across multiple micro-batches, through the
epoch-idempotent sink — arrival batching must never change who is
kept."""

from __future__ import annotations

from pyspark.sql import functions as F

from otel_worker_spark.fixtures import token_sequences_from_events
from otel_worker_spark.ops import token_stats as tks
from otel_worker_spark.streaming import sample_gate_stream

SF_DIR = "/root/testdata/sf0.001"

EID = "CAST(substr(doc_id, 5) AS BIGINT)"


def _decisions(df):
    return {r["doc_id"]: (r["u_q"], r["rate_q"], r["kept"]) for r in df.collect()}


def test_stream_sample_gate_equals_batch(spark, tmp_path):
    tok = token_sequences_from_events(spark, SF_DIR).persist()
    try:
        # freeze the rate table from the full reference snapshot —
        # the release-time artifact the stream serves against
        rates_dir = str(tmp_path / "rates")
        tks.sample_rates(tks.mixture_weights(tok)).write.parquet(rates_dir)

        # two arrival waves → two micro-batches (maxFilesPerTrigger=1)
        src = str(tmp_path / "tok-in")
        for pred in (f"{EID} % 2 = 0", f"{EID} % 2 = 1"):
            tok.where(F.expr(pred)).coalesce(1).write.mode("append").parquet(src)

        out = str(tmp_path / "gate-out")
        q = sample_gate_stream(
            spark,
            src,
            str(tmp_path / "ckpt"),
            out,
            rates_dir,
            max_files_per_trigger=1,
        )
        q.awaitTermination(300)

        landed = spark.read.parquet(out)
        assert landed.select("epoch").distinct().count() >= 2
        got = _decisions(landed.drop("epoch"))
        want = _decisions(tks.sample_gate(tok))
        assert got == want
        # the gate must actually thin something AND keep something
        kept = [k for (_, _, k) in got.values()]
        assert 0 < sum(kept) < len(kept)
    finally:
        tok.unpersist()
