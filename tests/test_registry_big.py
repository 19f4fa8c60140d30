"""Nightly-scale oracle sweep: EVERY registry query vs its DuckDB
oracle at sf0.1 — 10× the driver gate's data (r4 verdict item 5).
Catches scale-dependent divergence (accumulation order, overflow,
fixture-size assumptions) before the driver does.

Run with ``python -m pytest -m big`` (deselected by default via
pytest.ini; never run concurrently with bench.py)."""

from __future__ import annotations

import duckdb
import pytest

from otel_worker_spark import registry

SF_DIR = "/root/testdata/sf0.1"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

pytestmark = pytest.mark.big


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module", autouse=True)
def parse_cache():
    # 15+ pipeline_* entries share one parse→enrich→route subplan; at
    # sf0.1 re-parsing per query would dominate the sweep (bench.py's
    # registry sweep uses the same memo)
    registry.enable_parse_cache()
    yield
    registry.clear_parse_cache()


_ORACLES = registry.oracle_sql()
_QUERIES = registry.queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_registry_query_matches_oracle_sf01(spark, con, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    a = sdf.toPandas()
    b = con.sql(_ORACLES[name]).df()
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: column sets differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b), f"{name}: row counts {len(a)} vs {len(b)}"
    assert a.equals(b), f"{name}: values differ at sf0.1"
