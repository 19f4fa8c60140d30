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
