"""ANN build/serve split (ops/ann_index.py): the serve path must
return bit-identical results to inline recomputation, must NOT
retrain when the persisted index is current, must rebuild when the
corpus changes, and must read only the probed posting partitions."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from otel_worker_spark.ops import ann_index as ai
from otel_worker_spark.ops import similarity as sim
from otel_worker_spark.store import TableStore

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_serve_matches_inline(spark, embs, tmp_root):
    root = os.path.join(tmp_root, "ivf")
    ai.build_ivf_index(embs, root)
    got = _rows(ai.ivf_serve_topk(embs, root))
    want = _rows(sim.ivf_kmeans_topk(embs, n_queries=ai.SERVE_QUERIES, k=ai.SERVE_K))
    assert got == want and len(got) == ai.SERVE_QUERIES * ai.SERVE_K


def test_pq_serve_matches_inline(spark, embs, tmp_root):
    root = os.path.join(tmp_root, "pq")
    ai.build_pq_index(embs, root, m=8, ksub=32, iters=1)
    got = _rows(ai.pq_serve_topk(embs, root))
    want = _rows(
        sim.pq_trained_topk(
            embs, n_queries=ai.SERVE_QUERIES, k=ai.SERVE_K, m=8, ksub=32, iters=1
        )
    )
    assert got == want and len(got) == ai.SERVE_QUERIES * ai.SERVE_K


def test_ivfpq_serve_matches_inline_and_prunes(spark, embs, tmp_root):
    root = os.path.join(tmp_root, "ivfpq")
    ai.build_ivfpq_index(embs, root)
    got = _rows(ai.ivfpq_serve_topk(embs, root))
    want = _rows(sim.ivfpq_topk(embs, n_queries=ai.SERVE_QUERIES, k=ai.SERVE_K))
    assert got == want
    # file pruning: a partitions= read returns ONLY files of those
    # lists — unprobed lists never reach the scan's file set
    store = TableStore(spark, os.path.join(root, "codes"))
    all_files = set(store.live_files())
    pruned = store.read(partitions=["0"])
    pruned_files = {f.removeprefix("file://") for f in pruned.inputFiles()}
    assert pruned_files and pruned_files < all_files
    assert all("cent_id=0" in f for f in pruned_files)


def test_ensure_builds_once_and_rebuilds_on_corpus_change(spark, embs, tmp_root):
    root = os.path.join(tmp_root, "ensure")
    calls = []
    params = {"family": "test", "v": 1}

    def builder():
        calls.append(1)
        os.makedirs(root, exist_ok=True)

    ai.clear_index_memo()
    ai._ensure(root, params, embs, builder)
    ai._ensure(root, params, embs, builder)
    assert len(calls) == 1
    # fresh process (memo cleared) + unchanged marker → still no rebuild
    ai.clear_index_memo()
    ai._ensure(root, params, embs, builder)
    assert len(calls) == 1
    # corpus row count changes → rebuild
    ai.clear_index_memo()
    ai._ensure(root, params, embs.limit(100), builder)
    assert len(calls) == 2
    # params change → rebuild
    ai.clear_index_memo()
    ai._ensure(root, {"family": "test", "v": 2}, embs.limit(100), builder)
    assert len(calls) == 3
    meta = json.load(open(os.path.join(root, "_meta.json")))
    assert meta["params"]["v"] == 2 and meta["corpus_rows"] == 100


def test_serve_plan_has_no_training_jobs(spark, embs, tmp_root):
    """The serve DataFrame's physical plan must contain no Python
    stage (no Lloyd, no encode kernel): serving is scan + broadcast
    join + window only."""
    root = os.path.join(tmp_root, "ivfpq-plan")
    ai.build_ivfpq_index(embs, root)
    plan = ai.ivfpq_serve_topk(embs, root)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ann_cli_build_then_serve(tmp_root):
    """jobs.py ann-build / ann-serve: the index lifecycle as
    spark-submit entrypoints — build writes the TableStore index,
    serve answers from it in a SEPARATE process (nothing in memory
    carries over; the persisted bytes are the interface)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = os.path.join(tmp_root, "ivfpq-cli")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    built = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs.py"), "ann-build",
         "--embeddings", f"{SF_DIR}/embeddings.parquet", "--index", idx,
         "--family", "ivfpq"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert built.returncode == 0, built.stderr[-2000:]
    rec = json.loads(built.stdout.strip().splitlines()[-1])
    assert rec["rows"] == 500 and not rec["skipped"]
    served = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs.py"), "ann-serve",
         "--embeddings", f"{SF_DIR}/embeddings.parquet", "--index", idx,
         "--family", "ivfpq", "--queries", "4", "--k", "3"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert served.returncode == 0, served.stderr[-2000:]
    out = json.loads(served.stdout.strip().splitlines()[-1])
    assert len(out["results"]) == 12
    assert {r["queryId"] for r in out["results"]} == {0, 1, 2, 3}


def test_incremental_append_visible_in_serve(spark, embs, tmp_root):
    """Index maintenance without retrain: build on the first 400
    vectors, append the remaining 100 as a new batch encoded against
    the PERSISTED model, then plant exact duplicates of the query
    vectors as a second batch — serving must surface each duplicate as
    its query's rank-1 neighbor (cosine exactly 1.0 beats every
    non-identical vector), and batch replay must be a no-op."""
    root = os.path.join(tmp_root, "ivf-incr")
    old = embs.where(F.col("vec_id") < 400)
    new = embs.where(F.col("vec_id") >= 400)
    ai.build_ivf_index(old, root)
    r1 = ai.append_ivf_postings(new, root, batch_id="day-2")
    assert not r1["skipped"] and r1["row_count"] == 100
    # replay = no-op (exactly-once maintenance)
    r2 = ai.append_ivf_postings(new, root, batch_id="day-2")
    assert r2["skipped"]
    store = TableStore(spark, os.path.join(root, "postings"))
    assert store.read().count() == 500
    # appended assignments must equal the build-time fold bit-for-bit
    got = {r.vec_id: r.cent_id for r in store.read().collect()}
    rebuilt = os.path.join(tmp_root, "ivf-rebuilt")
    ai.build_ivf_index(old, rebuilt)  # same corpus → same centroids
    ai.append_ivf_postings(embs.where(F.col("vec_id") >= 400), rebuilt, "x")
    want = {
        r.vec_id: r.cent_id
        for r in TableStore(spark, os.path.join(rebuilt, "postings")).read().collect()
    }
    assert got == want
    # plant duplicates of queries 0..3 with fresh ids → rank-1 hits
    dupes = (
        embs.where(F.col("vec_id") < 4)
        .select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding",
                F.col("label"))
    )
    ai.append_ivf_postings(dupes, root, batch_id="day-3")
    top = {
        r.query_id: (r.neighbor_id, r.cosine_u)
        for r in ai.ivf_serve_topk(embs, root, n_queries=4, k=1).collect()
    }
    for q in range(4):
        assert top[q][0] == q + 10_000, top
        # cosine of an identical vector ≈ 1.0; dot/(sqrt·sqrt) may be
        # one ulp under 1, so the floor-scaled value is 999999 or 10^6
        assert top[q][1] in (999_999, 1_000_000)


def test_incremental_append_ivfpq(spark, embs, tmp_root):
    """Same maintenance contract for the composed index: append
    encodes with the persisted coarse+codebook model; serve sees the
    planted duplicates as best compressed-distance matches (ADC
    distance 0 — identical vector ⇒ identical residual codes)."""
    root = os.path.join(tmp_root, "ivfpq-incr")
    ai.build_ivfpq_index(embs.where(F.col("vec_id") < 450), root)
    ai.append_ivfpq_codes(embs.where(F.col("vec_id") >= 450), root, "day-2")
    dupes = embs.where(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    ai.append_ivfpq_codes(dupes, root, "day-3")
    assert TableStore(spark, os.path.join(root, "codes")).read().count() == 504
    # k = everything: at ksub=8 the code space is coarse and many
    # vectors tie at ADC 0 (ranked id-asc), so assert the duplicate's
    # presence at distance 0 over the full ranking rather than top-5
    by_q: dict[int, list] = {}
    for r in ai.ivfpq_serve_topk(embs, root, n_queries=4, k=504).collect():
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.adc_d2_u))
    for q in range(4):
        # queries 0..3 are residual-codebook seeds, so their own
        # quantization error is exactly 0 — the planted duplicate must
        # surface with ADC distance exactly 0
        assert (q + 10_000, 0) in by_q[q], sorted(by_q[q])[:8]


def test_compaction_after_appends_preserves_serving(spark, embs, tmp_root):
    """Daily appends fragment the posting lists into per-batch small
    files; the TableStore's OPTIMIZE-style compaction must rewrite
    them per cent_id partition — atomically, serving results
    bit-identical, file count strictly down. This is the maintenance
    loop a deployed index runs beside ann-build/ann-serve."""
    root = os.path.join(tmp_root, "ivf-compact")
    ai.build_ivf_index(embs.where(F.col("vec_id") < 400), root)
    for i in range(4):
        lo, hi = 400 + i * 25, 425 + i * 25
        ai.append_ivf_postings(
            embs.where(f"vec_id >= {lo} AND vec_id < {hi}"), root, f"day-{i}"
        )
    store = TableStore(spark, os.path.join(root, "postings"))
    before = sorted(map(tuple, ai.ivf_serve_topk(embs, root).collect()))
    files_before = len(store.live_files())
    res = store.compact_small_files(target_rows=100_000)
    assert res["files_in"] > 0 and res["rows"] == 500
    files_after = len(store.live_files())
    assert files_after < files_before
    after = sorted(map(tuple, ai.ivf_serve_topk(embs, root).collect()))
    assert after == before
