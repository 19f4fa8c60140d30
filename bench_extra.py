#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

NOT the driver bench — ``bench.py`` stays frozen. This file isolates
each headline query with the noop sink so we time the computation,
not the sink/collect, captures ``explain("formatted")`` into
``plans/<tag>/<query>_{before,after}.txt``, and labels every job so
the (disabled-by-default) UI and event logs stay readable.

Usage:
    python bench_extra.py [--plans before|after] [--runs N] [q1 q2 ...]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def main() -> None:
    args = sys.argv[1:]
    plan_tag = None
    runs = 2
    if "--plans" in args:
        i = args.index("--plans")
        plan_tag = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    only = set(args)

    from pyspark.sql import functions as F

    from otel_worker_spark.fixtures import service_lookup_df, token_sequences_from_events
    from otel_worker_spark.ops import ann_index as ai
    from otel_worker_spark.ops import dedup as dd
    from otel_worker_spark.ops import similarity as sim
    from otel_worker_spark.pipeline import PipelineStores, ingest_batch, transform_batch
    from otel_worker_spark.queries import trace_summaries, traces_list
    from otel_worker_spark.registry import rel_pricing_summary
    from otel_worker_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="ows-bx-")

    tok_path = os.path.join(tmp, "tokens")
    token_sequences_from_events(spark, SF_DIR).repartition(64).write.mode(
        "overwrite"
    ).parquet(tok_path)
    tokens = spark.read.parquet(tok_path)
    lookup = service_lookup_df(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # plan-only frames (lazy) and runnable actions per query
    def agg_frame(columns=None):
        routed = transform_batch(tokens, lookup, with_inner=False, columns=columns)
        return routed.groupBy("signal").agg(
            F.count("*").alias("rows"), F.sum("n_tok").alias("sum_n_tok")
        )

    pruned_cols = [
        "trace_id", "span_id", "name", "kind", "severity",
        "service_name", "start_time", "end_time",
    ]

    idx_root = os.path.join(tmp, "ann-index", "ivfpq")

    def ensure_index():
        if not os.path.exists(idx_root):
            ai.build_ivfpq_index(embs, idx_root)

    stores_root = os.path.join(tmp, "stores")

    def ensure_stores():
        if not os.path.exists(stores_root):
            stores = PipelineStores(spark, stores_root)
            ingest_batch(spark, tokens, lookup, stores, batch_id=0)
        return PipelineStores(spark, stores_root)

    QUERIES: dict[str, tuple] = {
        # name -> (frame_fn for explain | None, action_fn)
        "pipeline_agg": (lambda: agg_frame(), lambda: noop(agg_frame())),
        "pipeline_agg_pruned": (
            lambda: agg_frame(pruned_cols),
            lambda: noop(agg_frame(pruned_cols)),
        ),
        "pipeline_ingest": (
            lambda: transform_batch(tokens, lookup),
            lambda: ingest_batch(
                spark,
                tokens,
                lookup,
                PipelineStores(spark, os.path.join(tmp, f"st-{time.monotonic_ns()}")),
                batch_id=0,
            ),
        ),
        "traces_list": (
            lambda: traces_list(ensure_stores().spans.read(partition="traces")),
            lambda: noop(traces_list(ensure_stores().spans.read(partition="traces"))),
        ),
        "trace_summaries": (
            lambda: trace_summaries(
                ensure_stores().spans.read(partition="traces"), limit=20
            ),
            lambda: noop(
                trace_summaries(ensure_stores().spans.read(partition="traces"), limit=20)
            ),
        ),
        "dedup_minhash_pairs": (
            lambda: dd.minhash_lsh_pairs(docs, hash_impl="xxhash64"),
            lambda: noop(dd.minhash_lsh_pairs(docs, hash_impl="xxhash64")),
        ),
        "dedup_minhash_pairs_128": (
            lambda: dd.minhash_lsh_pairs(
                docs, hash_impl="xxhash64", n_perms=dd.PROD_PERMS, n_bands=dd.PROD_BANDS
            ),
            lambda: noop(
                dd.minhash_lsh_pairs(
                    docs, hash_impl="xxhash64",
                    n_perms=dd.PROD_PERMS, n_bands=dd.PROD_BANDS,
                )
            ),
        ),
        "dedup_groups": (
            lambda: dd.dedup_groups(docs, hash_impl="xxhash64"),
            lambda: noop(dd.dedup_groups(docs, hash_impl="xxhash64")),
        ),
        "ann_cosine_topk": (
            lambda: sim.cosine_topk(embs),
            lambda: noop(sim.cosine_topk(embs)),
        ),
        "ann_ivfpq_serve": (
            lambda: (ensure_index(), ai.ivfpq_serve_topk(embs, idx_root, n_queries=8, k=5))[1],
            lambda: (
                ensure_index(),
                noop(ai.ivfpq_serve_topk(embs, idx_root, n_queries=8, k=5)),
            ),
        ),
        "ann_ivfpq_inline": (
            lambda: sim.ivfpq_topk(embs),
            lambda: noop(sim.ivfpq_topk(embs)),
        ),
        "rel_pricing_summary": (
            lambda: rel_pricing_summary(spark, SF_DIR),
            lambda: noop(rel_pricing_summary(spark, SF_DIR)),
        ),
    }

    results: dict[str, list[float]] = {}
    for name, (frame_fn, action_fn) in QUERIES.items():
        if only and name not in only:
            continue
        if plan_tag and frame_fn is not None:
            os.makedirs(PLANS_DIR, exist_ok=True)
            try:
                txt = frame_fn()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception as exc:  # pragma: no cover
                txt = f"explain failed: {exc!r}"
            with open(
                os.path.join(PLANS_DIR, f"{name}_{plan_tag}.txt"), "w"
            ) as fh:
                fh.write(txt)
            dd.release_persisted_signatures()
        sc.setJobDescription(f"bx:{name}")
        times = []
        for r in range(runs):
            t0 = time.perf_counter()
            action_fn()
            times.append(round(time.perf_counter() - t0, 3))
            dd.release_persisted_signatures()
        sc.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times}", flush=True)

    print("RESULTS " + repr(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
