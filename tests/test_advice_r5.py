"""Regression tests for the r5 ADVICE items that live in the dedup
path: the verify stage's broadcast gate and the minhash Arrow kernel's
empty-input behavior (the api.py Content-Length item is covered in
test_api_http.py, the bench secondary-window item in the bench run
artifacts)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from otel_worker_spark.ops import dedup as dd

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_verified_pairs_fallback_plan_same_results(spark, docs, monkeypatch):
    """Above VERIFY_BROADCAST_MAX_PAIRS candidates the verify stage
    must drop every broadcast hint (the build side carries ~1 KB
    shingle arrays per pair — a candidate-heavy corpus would hit the
    8 GB broadcast limit) and stream through shuffle joins with
    IDENTICAL results."""
    want = sorted(map(tuple, dd.verified_pairs(docs).collect()))
    dd.release_persisted_signatures()
    monkeypatch.setattr(dd, "VERIFY_BROADCAST_MAX_PAIRS", 0)
    fallback = dd.verified_pairs(docs)
    plan = fallback._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    got = sorted(map(tuple, fallback.collect()))
    dd.release_persisted_signatures()
    assert got == want and len(got) > 0
    # the shingle-carrying joins must not be broadcast in the fallback
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_kernel_empty_hash_array_yields_nulls(spark):
    """An empty/NULL hash array must yield a NULL-filled signature in
    the Arrow kernel — the same shape the Catalyst array_min path
    produces — instead of a zero-size-reduction ValueError killing the
    task (latent today: shingles_expr guarantees ≥1 shingle)."""
    hashed = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "hs": [[7, 11], [], None]})
    ).select("doc_id", F.col("hs").cast("array<long>").alias("hs"))
    out = {
        r.doc_id: r.sig
        for r in dd._minhash_fold_arrow(hashed, dd.PROD_PERMS).collect()
    }
    assert len(out[1]) == dd.PROD_PERMS and all(v is not None for v in out[1])
    assert out[2] == [None] * dd.PROD_PERMS
    assert out[3] == [None] * dd.PROD_PERMS
