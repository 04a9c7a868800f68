"""Streaming/batch parity beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from reduction_dask_spark.sources import load_table

from .conftest import SF_SMALL


def test_st4_state_matches_batch_groupby(spark):
    from reduction_dask_spark.streaming import st4_stateful_user_totals

    got = st4_stateful_user_totals(spark, SF_SMALL).toPandas().set_index("user_id")
    exact = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(got) == len(exact)
    for uid in exact.index:
        assert got.loc[uid, "n_events"] == exact.loc[uid, "n"]
        assert abs(got.loc[uid, "sum_value"] - exact.loc[uid, "s"]) < 0.02


def test_st2_sessions_partition_events(spark):
    from reduction_dask_spark.streaming import st2_stream_sessionization

    sess = st2_stream_sessionization(spark, SF_SMALL).toPandas()
    total = load_table(spark, SF_SMALL, "events").count()
    assert sess["n_events"].sum() == total  # every event in exactly one session
    assert (sess["n_events"] >= 1).all()
