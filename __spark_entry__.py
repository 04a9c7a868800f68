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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
