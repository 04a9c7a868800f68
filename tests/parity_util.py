"""Shared harness for the r16 adversarial-corpus parity suites.

The r15 technique (tests/test_r15_oracle_parity.py) drove the seven
rows-only→oracle conversions against synthetic corpora that hit the
branches the shipped testdata never reaches. The r16 suites extend
that treatment to the highest-traffic queries that remain rows-only
(no SQL oracle is possible — iterative float fits, sketch bytes,
engine-native hashes), so the ground truth is an INDEPENDENT
numpy/pure-python replica evaluated on the same branch-forcing corpus
instead of DuckDB.

Determinism note: several replicas (IRLS, Lloyd) must reproduce the
engine's float-addition order. Every corpus here is written as ONE
parquet file (coalesce(1)) small enough for one Arrow batch, so the
engine's per-partition partial is a single numpy pass in row order —
exactly what the replica computes. Outputs additionally round (6 dp
coefs, 5 dp distances), so the comparisons are robust as well as
bit-faithful at this size.
"""

from __future__ import annotations


def run_registered(spark, tmp_path, name, tables):
    """Write `tables` (name -> list-of-rows + schema str, or a Spark
    DF) as single-file parquet under tmp_path and run the REGISTERED
    query on them. Returns the result as a pandas frame."""
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    for t, df in tables.items():
        if isinstance(df, tuple):
            df = spark.createDataFrame(*df)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"{t}.parquet")
        )
    try:
        return REGISTRY[name].fn(spark, str(tmp_path)).toPandas()
    finally:
        release_pinned()
        spark.catalog.clearCache()


def docs_table(rows):
    """(doc_id, text, lang) rows -> createDataFrame args."""
    return (rows, "doc_id long, text string, lang string")


def emb_table(rows):
    """(vec_id, embedding float-list) rows -> createDataFrame args."""
    return (rows, "vec_id long, embedding array<float>")
