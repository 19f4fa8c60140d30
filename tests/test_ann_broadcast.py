"""Broadcast-geometry ANN dispatch (r4 verdict "What's wrong" #1):
above LITERAL_FOLD_BUDGET candidate vectors the literal-fold plans
switch to Arrow kernels holding the codebook/centroid table as a
task-broadcast numpy array. These tests pin (a) bit-identity between
the two paths at a geometry both can run, (b) that production geometry
(m=8, ksub=256) completes with a sane, still-zero-exchange plan, and
(c) the big-geometry results against an independent pure-numpy
reference (no Spark expressions in the checker)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from otel_worker_spark.ops import similarity as sim

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pq_trained_paths_bit_identical(embs):
    lit = _rows(sim.pq_trained_topk(embs, path="literal"))
    brd = _rows(sim.pq_trained_topk(embs, path="broadcast"))
    assert lit == brd and len(lit) == 8 * 5


def test_ivf_assign_paths_bit_identical(embs):
    lit = _rows(sim.ivf_assignments(embs, path="literal"))
    brd = _rows(sim.ivf_assignments(embs, path="broadcast"))
    assert lit == brd and len(lit) == embs.count()


def test_ivf_topk_paths_bit_identical(embs):
    lit = _rows(sim.ivf_topk(embs, path="literal"))
    brd = _rows(sim.ivf_topk(embs, path="broadcast"))
    assert lit == brd and len(lit) == 8 * 5


def test_auto_dispatch_thresholds():
    assert sim._use_literal(sim.PQ_M * sim.PQ_KSUB, "auto")  # 32 → literal
    assert sim._use_literal(sim.N_CENTROIDS, "auto")
    assert not sim._use_literal(8 * 32, "auto")  # registry big geometry
    assert not sim._use_literal(64, "auto")
    assert not sim._use_literal(8 * 256, "auto")  # production geometry


def test_production_geometry_sane_plan(embs):
    """m=8, ksub=256 — the geometry where the literal fold would embed
    2048 codebook vectors (16k struct expressions) into the plan. The
    Arrow path must complete, keep the zero-exchange-before-window
    shape, and keep the plan O(1)-sized."""
    df = sim.pq_trained_topk(embs, m=8, ksub=256, iters=1)
    plan = _plan(df)
    # exactly one exchange: the final per-query top-k window
    assert plan.count("Exchange") == 1
    # O(1) plan: no thousands of embedded literals
    assert len(plan) < 20_000
    assert df.count() == 8 * 5


def _np_reference_pq(E32, m, ksub, iters, n_queries, k):
    """Independent integer-exact PQ (train → encode → ADC → top-k) in
    plain numpy — replicates the documented semantics, shares no code
    with the Spark kernels beyond numpy itself."""
    Q = np.floor(1_000_000.0 * E32.astype(np.float64)).astype(np.int64)
    n, dim = Q.shape
    sub = dim // m
    cbs = [
        [list(Q[c, j * sub : (j + 1) * sub]) for c in range(ksub)]
        for j in range(m)
    ]
    for _ in range(iters):
        codes = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            cb = np.array(cbs[j], dtype=np.int64)
            d = ((Q[:, j * sub : (j + 1) * sub][:, None, :] - cb[None]) ** 2).sum(-1)
            codes[:, j] = d.argmin(axis=1)
        for j in range(m):
            for c in range(ksub):
                mask = codes[:, j] == c
                if mask.any():
                    s = Q[mask, j * sub : (j + 1) * sub].sum(axis=0)
                    cnt = float(mask.sum())
                    cbs[j][c] = [int(math.floor(v / cnt)) for v in s]
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        cb = np.array(cbs[j], dtype=np.int64)
        d = ((Q[:, j * sub : (j + 1) * sub][:, None, :] - cb[None]) ** 2).sum(-1)
        codes[:, j] = d.argmin(axis=1)
    out = []
    for q in range(n_queries):
        adc = np.zeros(n, dtype=np.int64)
        for j in range(m):
            cb = np.array(cbs[j], dtype=np.int64)
            lut = ((Q[q, j * sub : (j + 1) * sub][None, :] - cb) ** 2).sum(-1)
            adc += lut[codes[:, j]]
        order = sorted(
            (int(adc[i]), i) for i in range(n) if i != q
        )[:k]
        out += [(q, r + 1, i, d) for r, (d, i) in enumerate(order)]
    return sorted(out)


def test_big_geometry_matches_numpy_reference(embs):
    rows = embs.select("vec_id", "embedding").collect()
    E = np.stack(
        [np.array(r.embedding, dtype=np.float32) for r in sorted(rows, key=lambda r: r.vec_id)]
    )
    # vec_ids are dense 0..n-1 (fixture contract) — the reference
    # indexes by position
    assert sorted(int(r.vec_id) for r in rows) == list(range(len(rows)))
    want = _np_reference_pq(E, m=8, ksub=64, iters=1, n_queries=8, k=5)
    got = _rows(sim.pq_trained_topk(embs, m=8, ksub=64, iters=1))
    assert got == want


def test_ivfpq_plan_and_production_geometry(embs):
    """Composed IVF+PQ: the serving plan must be scan → narrow Arrow
    encode → broadcast LUT equi-join → ONE top-k exchange, and the
    same kernel must hold at production geometry (k=64 lists, m=8,
    ksub=64) — plan size O(1), list pruning via join selectivity."""
    df = sim.ivfpq_topk(embs)
    df.collect()
    # adaptive plans print Final + Initial sections — assert on Final
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    big = sim.ivfpq_topk(embs, n_centroids=64, n_probe=8, m=8, ksub=64)
    assert big.count() == 8 * 5
    assert len(_plan(big)) < 20_000
