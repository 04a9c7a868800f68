"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``reduction_dask_spark.registry``: every implemented
operator from SURVEY.md §2 registers a query callable and (when
SQL-expressible) a DuckDB oracle there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reduction_dask_spark.registry import REGISTRY, load_all_operators

load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: M1 era-bucketed
    Spearman rank correlation (reference metrics.py:5-22)."""
    from reduction_dask_spark.operators.metrics import m1_spearman_by_era

    return m1_spearman_by_era(spark, "/root/testdata/sf0.001")


def _cache_scoped(fn: Callable[[SparkSession, str], DataFrame]):
    """Scope persist() lifetimes to one query: building query N+1 drops
    the caches query N left behind (bench.py / tools/compare.py already
    do this between queries; this covers any runner that calls the
    ``queries()`` callables directly in one shared session).  Safe even
    if a runner builds several DataFrames before collecting — an
    unpersisted plan recomputes, it never returns wrong rows."""

    def scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    scoped.__name__ = getattr(fn, "__name__", "query")
    scoped.__doc__ = fn.__doc__
    return scoped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _cache_scoped(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
