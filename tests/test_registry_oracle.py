"""Registry-wide oracle sweep at sf0.001 — the local mirror of the
driver's CORRECTNESS gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB on rows, column names, and
stringified values (order-insensitive, column-sorted)."""

from __future__ import annotations

import duckdb
import pytest

from otel_worker_spark import registry

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


def test_every_query_has_oracle_or_is_whitelisted():
    no_oracle = set(_QUERIES) - set(_ORACLES)
    # every registry query carries a DuckDB oracle (rows+schema+hash),
    # except the iterative BPE trainer rows (rows-only by design —
    # pinned against a single-node reference in test_token_stats.py)
    assert no_oracle == {"token_bpe_merges", "token_bpe_compression"}
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_registry_query_matches_oracle(spark, con, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    a = sdf.toPandas()
    b = con.sql(_ORACLES[name]).df()
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: column sets differ (hash compare would fail): "
        f"{sorted(a.columns)} vs {sorted(b.columns)}"
    )
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b), f"{name}: row counts {len(a)} vs {len(b)}"
    assert a.equals(b), f"{name}: values differ"
