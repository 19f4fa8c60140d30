#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Measures the north-rule metric — end-to-end parse → enrich → route →
aggregate throughput in sequences/sec over the token table — plus the
headline read-side and training-data queries, and evidences the
two-cluster-size scaling criterion by re-running the identical job at
a second parallelism level (local[N/4]) in a subprocess (no real
cluster in this sandbox; see BASELINE.md measurement protocol).

Env:
  SPARK_GRAFT_SF_DIR   input tables (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     primary parallelism (default 32)
  BENCH_SCALING=0      skip the second-level scaling run
  BENCH_SINGLE_CORES   (internal) run one measurement and exit
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TIMED_RUNS = 2


def _measure(cores: int) -> dict:
    from pyspark.sql import functions as F

    from otel_worker_spark.fixtures import service_lookup_df, token_sequences_from_events
    from otel_worker_spark.ops import dedup as dd
    from otel_worker_spark.ops import similarity as sim
    from otel_worker_spark.pipeline import PipelineStores, ingest_batch, transform_batch
    from otel_worker_spark.queries import trace_summaries, traces_list
    from otel_worker_spark.registry import rel_pricing_summary
    from otel_worker_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cores}", cores=cores, shuffle_partitions=cores)
    tmp = tempfile.mkdtemp(prefix="ows-bench-")
    timings: dict[str, float] = {}
    try:
        # ---- setup (untimed): materialize the token table ------------
        # Repartitioned like a real ingest source would be (the events
        # parquet is one file → 1-2 input splits → no parallelism).
        # Partition count is FIXED across parallelism levels so the
        # scaling comparison sees identical inputs.
        tok_path = os.path.join(tmp, "tokens")
        tok_src = token_sequences_from_events(spark, SF_DIR).repartition(64)
        tok_src.write.mode("overwrite").parquet(tok_path)
        tokens = spark.read.parquet(tok_path)
        n_seq = tokens.count()
        lookup = service_lookup_df(spark)

        def timed(name: str, fn, runs: int = N_TIMED_RUNS) -> None:
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)

        # ---- headline: parse → enrich → route → aggregate ------------
        def pipeline_agg():
            routed = transform_batch(tokens, lookup, with_inner=False)
            (
                routed.groupBy("signal")
                .agg(F.count("*").alias("rows"), F.sum("n_tok").alias("sum_n_tok"))
                .collect()
            )

        pipeline_agg()  # warm (JVM + Arrow + codegen)
        timed("pipeline_agg", pipeline_agg)

        # ---- full ingest incl. single-pass partitioned sink write ----
        def pipeline_ingest():
            root = os.path.join(tmp, f"stores-{time.monotonic_ns()}")
            stores = PipelineStores(spark, root)
            ingest_batch(spark, tokens, lookup, stores, batch_id=0)
            return stores

        t0 = time.perf_counter()
        stores = pipeline_ingest()
        timings["pipeline_ingest"] = round(time.perf_counter() - t0, 3)

        spans = stores.spans.read(partition="traces")
        timed("traces_list", lambda: traces_list(spans).collect())
        timed("trace_summaries", lambda: trace_summaries(spans, limit=20).collect())

        # ---- training-data ops ---------------------------------------
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        timed("dedup_minhash_pairs", lambda: dd.minhash_lsh_pairs(docs).count(), runs=1)
        timed("ann_cosine_topk", lambda: sim.cosine_topk(embs).count(), runs=1)
        timed("rel_pricing_summary", lambda: rel_pricing_summary(spark, SF_DIR).collect())

        thr = n_seq / timings["pipeline_agg"]
        return {
            "cores": cores,
            "n_seq": n_seq,
            "queries": timings,
            "throughput_seq_per_sec": round(thr, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    single = os.environ.get("BENCH_SINGLE_CORES")
    if single:
        print("BENCH_SINGLE_RESULT " + json.dumps(_measure(int(single))))
        return

    primary = _measure(CPUS)
    result = {
        "metric": "parse->route->aggregate throughput (sequences/sec)",
        "value": primary["queries"]["pipeline_agg"],
        "unit": "sec",
        "sf": SF_DIR,
        "queries": primary["queries"],
        "n_seq": primary["n_seq"],
        "cores": CPUS,
        "throughput_seq_per_sec": primary["throughput_seq_per_sec"],
    }

    if os.environ.get("BENCH_SCALING", "1") != "0" and CPUS >= 4:
        low_cores = max(1, CPUS // 4)
        env = dict(os.environ, BENCH_SINGLE_CORES=str(low_cores))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        low = None
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_SINGLE_RESULT "):
                low = json.loads(line[len("BENCH_SINGLE_RESULT "):])
        if low:
            thr_hi = primary["throughput_seq_per_sec"]
            thr_lo = low["throughput_seq_per_sec"]
            result["scaling"] = {
                "low_cores": low_cores,
                "high_cores": CPUS,
                "throughput_low": thr_lo,
                "throughput_high": thr_hi,
                "efficiency": round((thr_hi / thr_lo) / (CPUS / low_cores), 3),
            }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
