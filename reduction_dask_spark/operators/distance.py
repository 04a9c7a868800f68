"""Distance / information-theory operators (SURVEY.md §2.3 F5-F8,
§2.11 D1/D4, §2.5 A5).

The reference computes 5-bin histograms, entropy, mutual information
and variation-of-information as numpy/scipy kernels per feature pair
(/root/reference/distance_func.py:9-22). All of it is aggregation
algebra — expressed here as pure DataFrame/SQL (no UDF), so it scales
as ordinary shuffled aggregates and is oracle-checkable.

Bucketing convention (portable across engines): 5 equal-width bins on
a fixed literal domain, ``bucket = least(4, greatest(0, floor(x / width)))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions import PRED_EVENTS_SQL, pred_events
from ..registry import query
from ..sources import load_table

N_BINS = 5
WIDTH = 100.0  # events.value domain is [0, 500)


def bucket(col: Column, width: float = WIDTH, n: int = N_BINS) -> Column:
    """F6 fixed-domain equal-width bucketing (distance_func.py:13-14
    np.histogram(x, 5))."""
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(col / width))).cast("int")


def bucket_sql(expr: str, width: float = WIDTH, n: int = N_BINS) -> str:
    return f"CAST(least({n - 1}, greatest(0, floor(({expr}) / {width}))) AS INTEGER)"


BX = bucket_sql("value")
BY = bucket_sql(PRED_EVENTS_SQL)


# ------------------------------------------------------------ F5

@query(
    "f5_quantile",
    oracle="""
        SELECT round(quantile_cont(value, 0.25), 6) AS q25,
               round(quantile_cont(value, 0.75), 6) AS q75
        FROM events
    """,
    doc="F5 exact quantiles (tuners.py:144-145 np.quantile([.25,.75])). "
        "Exact percentile, not percentile_approx — approx differs per "
        "engine (SURVEY.md §7 hard-point #3). At 100 TB prefer "
        "approx_percentile for speed; exact kept for oracle parity.",
    tags=("agg",),
)
def f5_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("q25"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("q75"),
    )


# ------------------------------------------------------------ F6

@query(
    "f6_histogram",
    oracle=f"""
        SELECT {BX} AS bucket, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    doc="F6 1-D 5-bin histogram (distance_func.py:13 np.histogram).",
    tags=("agg",),
)
def f6_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(bucket(F.col("value")).alias("bucket")).agg(F.count("*").alias("n"))


# ------------------------------------------------------------ F7

ENTROPY_X_SQL = f"""
    WITH h AS (
        SELECT {BX} AS b, count(*) AS n FROM events GROUP BY 1
    ), t AS (SELECT sum(n) AS tot FROM h)
    SELECT -sum((n / tot) * ln(n / tot)) AS hx FROM h, t
"""


def entropy_of(df: DataFrame, col: Column) -> DataFrame:
    """F7 Shannon entropy of the bucketed column (distance_func.py:16-17
    scipy.stats.entropy of the histogram). Two chained aggregates —
    at scale: one shuffle for the histogram (≤ n_bins groups), then a
    scalar reduce."""
    h = df.groupBy(col.alias("b")).agg(F.count("*").alias("n"))
    tot = h.agg(F.sum("n").alias("tot"))
    p = h.crossJoin(F.broadcast(tot)).select((F.col("n") / F.col("tot")).alias("p"))
    return p.agg((-F.sum(F.col("p") * F.log(F.col("p")))).alias("hx"))


@query(
    "f7_entropy",
    oracle=f"SELECT round(hx, 6) AS entropy FROM ({ENTROPY_X_SQL})",
    doc="F7 entropy −Σ p·ln p over the 5-bin histogram "
        "(distance_func.py:16-17).",
    tags=("agg",),
)
def f7_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = entropy_of(ev, bucket(F.col("value")))
    return h.select(F.round(F.col("hx"), 6).alias("entropy"))


# ------------------------------------------------------- F8 / D1

# Joint + marginal bucket counts of (value, pred) and the information
# quantities derived from them. One scan, one small shuffle (≤25 joint
# cells), everything after is constant-size.
_INFO_SQL = f"""
    WITH joint AS (
        SELECT {BX} AS bx, {BY} AS by_, count(*) AS nxy
        FROM events GROUP BY 1, 2
    ), t AS (SELECT sum(nxy) AS tot FROM joint),
    mx AS (SELECT bx, sum(nxy) AS nx FROM joint GROUP BY bx),
    my AS (SELECT by_, sum(nxy) AS ny FROM joint GROUP BY by_),
    q AS (
        SELECT j.nxy / t.tot AS pxy, mx.nx / t.tot AS px, my.ny / t.tot AS py
        FROM joint j, t
        JOIN mx ON j.bx = mx.bx
        JOIN my ON j.by_ = my.by_
    ),
    info AS (
        SELECT sum(pxy * ln(pxy / (px * py))) AS mi,
               -sum(pxy * ln(px)) AS hx,
               -sum(pxy * ln(py)) AS hy
        FROM q
    )
"""


def _joint_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(mi, hx, hy) one-row frame from the joint histogram of
    (value-bucket, pred-bucket)."""
    ev = load_table(spark, sf_dir, "events")
    joint = ev.groupBy(
        bucket(F.col("value")).alias("bx"), bucket(pred_events()).alias("by_")
    ).agg(F.count("*").alias("nxy"))
    tot = joint.agg(F.sum("nxy").alias("tot"))
    mx = joint.groupBy("bx").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("by_").agg(F.sum("nxy").alias("ny"))
    q = (
        joint.crossJoin(F.broadcast(tot))
        .join(F.broadcast(mx), "bx")
        .join(F.broadcast(my), "by_")
        .select(
            (F.col("nxy") / F.col("tot")).alias("pxy"),
            (F.col("nx") / F.col("tot")).alias("px"),
            (F.col("ny") / F.col("tot")).alias("py"),
        )
    )
    return q.agg(
        F.sum(F.col("pxy") * F.log(F.col("pxy") / (F.col("px") * F.col("py")))).alias("mi"),
        (-F.sum(F.col("pxy") * F.log(F.col("px")))).alias("hx"),
        (-F.sum(F.col("pxy") * F.log(F.col("py")))).alias("hy"),
    )


@query(
    "f8_mutual_info",
    oracle=_INFO_SQL + "SELECT round(mi, 6) AS mutual_info FROM info",
    doc="F8 mutual information from the 5×5 contingency "
        "(distance_func.py:15 mutual_info_score(contingency=cXY)).",
    tags=("agg", "distance"),
)
def f8_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _joint_info(spark, sf_dir).select(F.round(F.col("mi"), 6).alias("mutual_info"))


@query(
    "d1_variation_of_information",
    oracle=_INFO_SQL + "SELECT round(hx + hy - 2 * mi, 6) AS vi FROM info",
    doc="D1 variation of information VI = H(x)+H(y)−2·I(x,y) on 5-bin "
        "histograms (distance_func.py:9-22). Pure aggregate SQL — the "
        "reference's scipy kernel needs no UDF at all.",
    tags=("distance",),
)
def d1_variation_of_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _joint_info(spark, sf_dir).select(
        F.round(F.col("hx") + F.col("hy") - 2 * F.col("mi"), 6).alias("vi")
    )


# ------------------------------------------------------- D4 / A5 / J2

@query(
    "d4_pairwise_corr_matrix",
    oracle="""
        WITH melted AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS fid,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        )
        SELECT a.fid AS fi, b.fid AS fj,
               round(corr(a.val, b.val), 6) AS corr
        FROM melted a JOIN melted b ON a.vec_id = b.vec_id AND a.fid < b.fid
        GROUP BY a.fid, b.fid
    """,
    doc="D4/A5/J2 pairwise feature matrix: melt features to rows, "
        "upper-triangle self-join, per-pair Pearson corr "
        "(feature_clustering.py:12-36 fan-out; nb cell 13 .corr()). "
        "Scale: the self-join shuffles on the row key once; pair count "
        "is p²/2 on FEATURES (not rows) so the output stays small. For "
        "p in the thousands switch to block-matrix multiplication on "
        "standardized columns (same plan shape).",
    tags=("distance", "join"),
)
def d4_pairwise_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    melted = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", (F.col("pos") + 1).alias("fid"), F.col("val").cast("double").alias("val"))
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.fid") < F.col("b.fid")))
        .groupBy(F.col("a.fid").alias("fi"), F.col("b.fid").alias("fj"))
        .agg(F.round(F.corr(F.col("a.val"), F.col("b.val")), 6).alias("corr"))
    )
