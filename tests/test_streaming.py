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


def test_st5_stream_join_matches_batch(spark):
    """Stream-stream interval join == batch self-join on the same data."""
    from reduction_dask_spark.streaming import st5_stream_stream_join

    got = {
        (r["click_id"], r["purchase_id"], r["lat_us"])
        for r in st5_stream_stream_join(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    exact = {
        (r["cid"], r["pid"], r["lat"])
        for r in a.join(b, "u")
        .filter((F.col("pts") >= F.col("cts")) & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")))
        .select("cid", "pid", (F.unix_micros("pts") - F.unix_micros("cts")).alias("lat"))
        .collect()
    }
    assert got == exact
    assert all(0 <= lat <= 3_600_000_000 for _, _, lat in got)
