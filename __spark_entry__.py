"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``otel_worker_spark.registry`` — the engine's
driver-facing catalog of (Spark query, DuckDB oracle) pairs covering
SURVEY.md §2 plus the training-data operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from otel_worker_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
