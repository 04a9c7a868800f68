"""Metric operators (SURVEY.md §2.10) + the W1 window they build on.

Flagship: ``m1_spearman_by_era`` — the reference's scoring function
``spearman_rank`` (/root/reference/metrics.py:5-22): per-era percentile
rank of predictions (pandas ``rank(pct=True, method="first")``), then
**pooled** Pearson correlation of (y_true, ranked_pred) across all rows
(pooled, not mean-of-per-era — metrics.py:21 computes one corrcoef).

Scale: one shuffle on era for the window (AQE handles era skew), then a
single all-reduce style aggregate for corr. No driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import ERA_EVENTS_SQL, PRED_EVENTS_SQL, clip, corr_safe, era_events, pred_events
from ..registry import query
from ..sources import load_table

# Shared CTE: (era, y_true, pred, event_id) scored frame from events.
BASE_SQL = f"""
    SELECT {ERA_EVENTS_SQL} AS era, value AS y_true,
           {PRED_EVENTS_SQL} AS pred, event_id
    FROM events
"""


def scored_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        era_events().alias("era"),
        F.col("value").alias("y_true"),
        pred_events().alias("pred"),
        "event_id",
    )


def pct_rank_first(df: DataFrame, group: str, value: str, tiebreak: str) -> Column:
    """W1: pandas ``rank(pct=True, method="first")`` within ``group``.

    method="first" = ties broken by original position; Spark equivalent
    is row_number over (value, stable-key) divided by the group size
    (metrics.py:19 — SURVEY.md §4 "Anticipated custom pieces" #2).
    """
    w = Window.partitionBy(group).orderBy(F.asc(value), F.asc(tiebreak))
    cnt = Window.partitionBy(group)
    return F.row_number().over(w).cast("double") / F.count("*").over(cnt).cast("double")


W1_SQL = f"""
    SELECT era, y_true, event_id,
           CAST(row_number() OVER (PARTITION BY era ORDER BY pred, event_id) AS DOUBLE)
           / CAST(count(*) OVER (PARTITION BY era) AS DOUBLE) AS pred_rank
    FROM ({BASE_SQL})
"""


@query(
    "w1_pct_rank_by_era",
    oracle=f"SELECT event_id, era, pred_rank FROM ({W1_SQL})",
    doc="W1 per-era percentile rank with method='first' tie-breaking "
        "(metrics.py:19; tuners.py:432, 574).",
    tags=("window", "metrics"),
)
def w1_pct_rank_by_era(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = scored_events(spark, sf_dir)
    return df.select(
        "event_id", "era", pct_rank_first(df, "era", "pred", "event_id").alias("pred_rank")
    )


def spearman_by_era(scored: DataFrame, y_true: str = "y_true", pred: str = "pred",
                    era: str = "era", key: str = "event_id") -> DataFrame:
    """M1 as a reusable library transform over any scored frame."""
    ranked = scored.select(
        F.col(y_true).alias("y_true"),
        pct_rank_first(scored, era, pred, key).alias("pred_rank"),
    )
    return ranked.agg(F.round(corr_safe("y_true", "pred_rank"), 6).alias("spearman_era_corr"))


@query(
    "m1_spearman_by_era",
    oracle=f"""
        SELECT round(corr(y_true, pred_rank), 6) AS spearman_era_corr
        FROM ({W1_SQL})
    """,
    doc="M1 flagship: era-bucketed Spearman rank correlation "
        "(metrics.py:5-22; duplicated at tuners.py:424-435, 566-577). "
        "Pooled corr across rows after per-era pct-rank.",
    tags=("metrics", "flagship"),
)
def m1_spearman_by_era(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spearman_by_era(scored_events(spark, sf_dir))


@query(
    "m2_quartic_error",
    oracle=f"""
        SELECT round(avg(power(y_true - pred, 4)), 6) AS quartic_err
        FROM ({BASE_SQL})
    """,
    doc="M2/F3 quartic error mean((y-ŷ)^4) (metrics.py:25-33) — "
        "tail-sensitive loss.",
    tags=("metrics",),
)
def m2_quartic_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = scored_events(spark, sf_dir)
    return df.agg(
        F.round(F.avg(F.pow(F.col("y_true") - F.col("pred"), 4)), 6).alias("quartic_err")
    )


@query(
    "f4_pearson_corr",
    oracle=f"""
        SELECT round(corr(y_true, pred), 6) AS pearson
        FROM ({BASE_SQL})
    """,
    doc="F4 scalar Pearson correlation (metrics.py:21 np.corrcoef).",
    tags=("metrics",),
)
def f4_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = scored_events(spark, sf_dir)
    return df.agg(F.round(corr_safe("y_true", "pred"), 6).alias("pearson"))


@query(
    "m4_payout_clip",
    oracle="""
        SELECT event_id,
               round(least(1.0, greatest(-1.0, (value - 50) / 20.0)), 6) AS payout
        FROM events
    """,
    doc="M4/P10 Numerai payout clip (utils.py:51-55: "
        "((scores-0)/.2).clip(lower=-1, upper=1), rescaled to the "
        "events value domain).",
    tags=("metrics", "scalar"),
)
def m4_payout_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    payout = clip((F.col("value") - 50) / 20.0, -1.0, 1.0)
    return ev.select("event_id", F.round(payout, 6).alias("payout"))
