"""Property-based checks (hypothesis) for the mixture family's
exact-integer primitives: the portable isqrt SQL must equal
``math.isqrt`` on ANY BIGINT in BOTH engines, the md5-Horner uniform
must equal a direct Python recompute of ``int(md5(doc)[:6], 16)`` on
ANY doc_id string in BOTH engines, and ``mixture_weights`` must equal
a pure-Python integer reference on ANY source/size distribution —
the exactness story cannot rest on fixture shapes alone."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from otel_worker_spark.ops import token_stats as tks


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        # full non-negative BIGINT range — the overflow-free upward
        # check must hold right up to 2^63-1 (perfect squares near the
        # top are the regression case for the naive (s0+1)^2 form)
        st.integers(min_value=0, max_value=2**63 - 1)
        | st.sampled_from(
            [2**63 - 1, 3037000499**2, 3037000499**2 - 1, 3037000499**2 + 1]
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_isqrt_sql_equals_math_isqrt_both_engines(spark, ns):
    expr = tks._isqrt_sql("n")
    want = [math.isqrt(n) for n in ns]
    got_spark = [
        r["s"]
        for r in spark.createDataFrame([(n,) for n in ns], "n bigint")
        .selectExpr("n", f"{expr} AS s")
        .orderBy("n")
        .collect()
    ]
    assert got_spark == [math.isqrt(n) for n in sorted(ns)]
    con = duckdb.connect()
    vals = ", ".join(f"({n})" for n in ns)
    got_duck = [
        row[0]
        for row in con.sql(
            f"SELECT CAST({expr} AS BIGINT) FROM (VALUES {vals}) v(n) ORDER BY n"
        ).fetchall()
    ]
    assert got_duck == [math.isqrt(n) for n in sorted(ns)]
    assert sorted(want) == [math.isqrt(n) for n in sorted(ns)]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_uniform_expr_equals_python_md5_both_engines(spark, ids):
    def ref(doc_id: str) -> int:
        return int(hashlib.md5(doc_id.encode()).hexdigest()[:6], 16)

    expr = tks._uniform_expr()
    rows = spark.createDataFrame([(i,) for i in ids], "doc_id string").selectExpr(
        "doc_id", f"{expr} AS u"
    )
    for r in rows.collect():
        assert r["u"] == ref(r["doc_id"])
        assert 0 <= r["u"] < tks.SAMPLE_Q
    con = duckdb.connect()
    vals = ", ".join("(" + "'" + i.replace("'", "''") + "')" for i in ids)
    for doc_id, u in con.sql(
        f"SELECT doc_id, {expr} FROM (VALUES {vals}) v(doc_id)"
    ).fetchall():
        assert u == ref(doc_id)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.dictionaries(
        keys=st.sampled_from([f"src-{i}" for i in range(8)]),
        values=st.lists(
            st.integers(min_value=1, max_value=5000), min_size=1, max_size=6
        ),
        min_size=1,
        max_size=8,
    )
)
def test_mixture_weights_equals_integer_reference(spark, dist):
    rows = [
        (f"{src}-{j}", list(range(2)), n, src)
        for src, sizes in dist.items()
        for j, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    got = {r["source"]: r.asDict() for r in tks.mixture_weights(df).collect()}

    n_src = {s: sum(sizes) for s, sizes in dist.items()}
    w_num = {s: math.isqrt(n) for s, n in n_src.items()}
    w_tot = sum(w_num.values())
    budget = sum(n_src.values())
    for s in dist:
        sampled = (budget * w_num[s]) // w_tot
        assert got[s] == {
            "source": s,
            "n_docs": len(dist[s]),
            "n_src": n_src[s],
            "w_num": w_num[s],
            "weight_ppm": (tks.MIXTURE_PPM * w_num[s]) // w_tot,
            "sampled_tokens": sampled,
            "epochs_permille": (1000 * sampled) // n_src[s],
        }
