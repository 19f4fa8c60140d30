"""ANN quality diagnostic: recall@k of the three approximate families
(hyperplane-LSH near-dup blocking is covered elsewhere; here IVF —
stub and k-means quantizers — and PQ) against the exact cosine top-k
on the same deterministic corpus.

These are not oracle-equality checks (the approximations are SUPPOSED
to differ from exact); they pin a recall FLOOR so a refactor that
silently breaks candidate generation (wrong probe list, wrong
codebook slice) fails loudly instead of shipping an ANN that returns
plausible-looking garbage. Floors are intentionally loose — the
corpus is deterministic, so today's actual values sit well above
them (printed for the curious)."""

from __future__ import annotations

import pytest

from otel_worker_spark.ops import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id) for r in sim.cosine_topk(e).collect()
    }
    return e, exact


def _recall(approx_rows, exact_pairs):
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_ivf_topk_recall_floor(frames):
    e, exact = frames
    r = _recall(sim.ivf_topk(e).collect(), exact)
    print(f"ivf(stub) recall@5 = {r:.3f}")
    assert r >= 0.3


def test_ivf_kmeans_topk_recall_floor(frames):
    e, exact = frames
    r = _recall(sim.ivf_kmeans_topk(e).collect(), exact)
    print(f"ivf(kmeans) recall@5 = {r:.3f}")
    assert r >= 0.3


def test_pq_topk_recall_floor(frames):
    """PQ with m=4/ksub=8 over 64 dims is a coarse 12-bit code — the
    floor reflects that; the *shape* (codes valid, ADC ordering sane)
    is what a regression here would break."""
    e, exact = frames
    r = _recall(sim.pq_topk(e).collect(), exact)
    print(f"pq recall@5 = {r:.3f}")
    assert r >= 0.05


def test_pq_trained_recall_floor_vs_stub(frames):
    """Trained codebooks (per-subspace quantized Lloyd) must not lose
    recall vs the first-k stub at identical geometry — the r3 verdict's
    acceptance bar for replacing the stub. (Numpy pre-measurement said
    ~0.20 → ~0.25 at m=4/ksub=8; the corpus is deterministic so this
    is a stable assertion, not a flaky benchmark.)"""
    e, exact = frames
    stub = _recall(sim.pq_topk(e).collect(), exact)
    trained = _recall(sim.pq_trained_topk(e).collect(), exact)
    print(f"pq trained recall@5 = {trained:.3f} (stub {stub:.3f})")
    assert trained >= stub
    assert trained >= 0.05


def test_pq_trained_encode_zero_exchange(frames):
    """The trained-codebook encode must stay a literal argmin fold —
    a narrow map over the scan with NO Exchange (the scale property
    `pq_topk` pins; training must not regress it)."""
    e, _ = frames
    from pyspark.sql import functions as F

    cbs = sim.pq_train_codebooks(e)
    sub = sim.PQ_SUB_DIM
    enc_cols = []
    for j in range(sim.PQ_M):
        cands = [
            F.struct(
                F.expr(
                    sim._d2_int_spark(
                        sim._qsub_spark("embedding", j, sub),
                        sim._int_arr_lit(cbs[j][c]),
                    )
                ).alias("d2_u"),
                F.lit(c).cast("int").alias("code"),
            )
            for c in range(sim.PQ_KSUB)
        ]
        enc_cols.append(F.least(*cands)["code"].alias(f"code_{j}"))
    encoded = e.select(F.col("vec_id"), *enc_cols)
    plan = encoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pq_rerank_recall_beats_raw_pq(frames):
    """Candidate-pool + exact re-rank must strictly improve on raw
    ADC ordering (measured 0.20 → 0.525 here) — the property that
    makes the compressed scan usable in production."""
    e, exact = frames
    raw = _recall(sim.pq_topk(e).collect(), exact)
    rr = _recall(sim.pq_topk_rerank(e).collect(), exact)
    print(f"pq rerank recall@5 = {rr:.3f} (raw {raw:.3f})")
    assert rr > raw
    assert rr >= 0.3


def test_recall_eval_matches_set_intersection(frames):
    """The recall_eval OPERATOR must report exactly the recall this
    file computes by hand from the two collected rankings — per query,
    not just in aggregate — and quantize it as floor(1e6·hits/k)."""
    e, exact = frames
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_kmeans_topk(e).collect()
    }
    rows = {r.query_id: r for r in sim.recall_eval(e).collect()}
    assert set(rows) == {q for q, _ in exact}
    for q, r in rows.items():
        ex_q = {n for qq, n in exact if qq == q}
        ap_q = {n for qq, n in approx if qq == q}
        assert r.n_exact == len(ex_q)
        assert r.hits == len(ex_q & ap_q)
        assert r.recall_u == int(1000000 * r.hits / r.n_exact)


def test_serve_recall_gate(spark):
    """The persisted-index gate: per-query arithmetic exact, and a
    recall floor on the production serve path (same corpus, so the
    floor is stable, not flaky)."""
    from otel_worker_spark.ops import ann_index as ai

    rows = ai.ann_ivf_serve_recall(spark, SF_DIR).collect()
    assert len(rows) == ai.SERVE_QUERIES
    for r in rows:
        assert 0 <= r.hits <= r.n_exact == ai.SERVE_K
        assert r.recall_u == int(1000000 * r.hits / r.n_exact)
    mean = sum(r.hits for r in rows) / sum(r.n_exact for r in rows)
    print(f"serve recall@{ai.SERVE_K} = {mean:.3f}")
    assert mean >= 0.3
