"""Distributed linear-model machinery for the ML-harness operators.

The reference trains sklearn models inside Dask futures
(/root/reference/metrics.py:34-42, tuners.py:52-146). sklearn is not in
this container, and shipping whole fitted models is the reference's
scalability sin anyway. The Spark-first replacement is a ridge
regression fit by **additive sufficient statistics**:

    XtX = Σ xᵀx,  Xty = Σ xᵀy   (x includes an intercept column)

- ONE distributed pass (mapInPandas partial sums → groupBy-sum of
  ~ (d+1)² floats per fold) computes the per-fold statistics.
- Train statistics for fold i are total − fold_i, so k-fold CV needs
  ONE pass, not k (the reference scatters k copies: tuners.py:129-135).
- λ enters only at the (d+1)×(d+1) driver-side solve, so an entire
  hyperparameter grid reuses the same pass.
- Prediction is a pure `zip_with` dot-product expression — JVM-side,
  codegen, no Python in the scoring path.

At 100 TB: the data pass shuffles k·(d+1)² doubles, the solve is
milliseconds, scoring is a broadcast join + expression. Nothing scales
with rows except the two scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .functions import corr_safe
from .sources import load_table

DIM = 64  # embeddings feature width


N_INFORMATIVE = 8  # features 0..7 carry the planted signal


def planted_weight(d: int) -> float:
    return float((d % 3) + 1)


def supervised_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerai-shaped supervised frame from the embeddings table:
    (vec_id, era, features array<double>[64], y). era = vec_id % 20 —
    the static time bucket of the reference (utils.py:18).

    The target has PLANTED informative features (FIXTURES.md §1): a
    fixed linear signal on features 0..7 plus deterministic hash noise
    and a label component — so importance rankings (MDA/SHAP) have a
    ground truth and CV scores have real signal to find."""
    emb = load_table(spark, sf_dir, "embeddings")
    feats = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    signal = sum(
        F.element_at(F.col("features"), d + 1) * F.lit(planted_weight(d))
        for d in range(N_INFORMATIVE)
    )
    noise = ((F.col("vec_id") * 2654435761) % 1000) / 1000.0 - 0.5
    return (
        emb.select(
            "vec_id",
            (F.col("vec_id") % 20).cast("int").alias("era"),
            feats.alias("features"),
            F.col("label").cast("double").alias("label_y"),
        )
        .withColumn("y", signal + 0.1 * F.col("label_y") + 0.05 * noise)
        .drop("label_y")
    )


# ----------------------------------------------------- sufficient stats

def _suffstat_mapper(group: str, dim: int):
    width = (dim + 1) * (dim + 1) + (dim + 1) + 1

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group):
                X = np.stack(sub["features"].to_numpy()).astype(np.float64)
                X = np.hstack([np.ones((len(sub), 1)), X])
                y = sub["y"].to_numpy(dtype=np.float64)
                flat = acc.setdefault(int(g), np.zeros(width))
                flat[: (dim + 1) ** 2] += (X.T @ X).ravel()
                flat[(dim + 1) ** 2 : -1] += X.T @ y
                flat[-1] += len(sub)
        if acc:  # empty partitions yield nothing (Arrow can't type an
            # empty ndarray column as list<double>)
            yield pd.DataFrame(
                {group: list(acc.keys()), "vals": [flat.tolist() for flat in acc.values()]}
            )

    return fn


def fold_suffstats(df: DataFrame, group: str = "fold", dim: int = DIM) -> dict[int, tuple[np.ndarray, np.ndarray, float]]:
    """One distributed pass → {group: (XtX, Xty, n)}.

    Partial statistics travel as ONE array row per (partition, group) —
    ~(partitions×k) rows of (d+1)²+d+2 doubles — and merge by
    element-wise array addition in the aggregate, not (group, idx)
    scalar rows (which would shuffle (d+1)²× more rows)."""
    width = (dim + 1) * (dim + 1) + (dim + 1) + 1
    rows = df.mapInPandas(
        _suffstat_mapper(group, dim), schema=f"{group} int, vals array<double>"
    )
    zero = F.array_repeat(F.lit(0.0), width)
    merged = rows.groupBy(group).agg(
        F.aggregate(
            F.collect_list("vals"), zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)
        ).alias("vals")
    )
    pdf = merged.toPandas()
    out: dict[int, tuple[np.ndarray, np.ndarray, float]] = {}
    d1 = dim + 1
    for _, row in pdf.iterrows():
        flat = np.asarray(row["vals"])
        out[int(row[group])] = (
            flat[: d1 * d1].reshape(d1, d1),
            flat[d1 * d1 : -1],
            float(flat[-1]),
        )
    return out


def ridge_solve(xtx: np.ndarray, xty: np.ndarray, lam: float) -> np.ndarray:
    """(XtX + λI)⁻¹ Xty; the intercept is not penalized."""
    pen = np.eye(len(xtx)) * lam
    pen[0, 0] = 0.0
    return np.linalg.solve(xtx + pen, xty)


def fit_fold_models(
    stats: dict[int, tuple[np.ndarray, np.ndarray, float]], lam: float
) -> dict[int, np.ndarray]:
    """Leave-one-fold-out coefficients from per-fold statistics:
    train_i = Σ_j stats_j − stats_i (no second data pass)."""
    xtx_all = sum(s[0] for s in stats.values())
    xty_all = sum(s[1] for s in stats.values())
    return {
        g: ridge_solve(xtx_all - s[0], xty_all - s[1], lam) for g, s in stats.items()
    }


def fit_global_model(
    stats: dict[int, tuple[np.ndarray, np.ndarray, float]], lam: float
) -> np.ndarray:
    xtx_all = sum(s[0] for s in stats.values())
    xty_all = sum(s[1] for s in stats.values())
    return ridge_solve(xtx_all, xty_all, lam)


# ------------------------------------------------------------- predict

def coef_frame(spark: SparkSession, models: dict[int, np.ndarray], key: str = "fold") -> DataFrame:
    """Small (key, intercept, weights array) frame for broadcast join."""
    rows = [(int(g), float(c[0]), [float(w) for w in c[1:]]) for g, c in models.items()]
    return spark.createDataFrame(rows, f"{key} int, intercept double, weights array<double>")


def dot_expr(features: Column, weights: Column) -> Column:
    return F.aggregate(
        F.zip_with(features, weights, lambda x, w: x * w), F.lit(0.0), lambda a, x: a + x
    )


def with_prediction(df: DataFrame, coefs: DataFrame, key: str = "fold") -> Column:
    """Join fold coefficients (broadcast) and add `pred` — scoring stays
    entirely JVM-side."""
    out = df.join(F.broadcast(coefs), key)
    return out.withColumn(
        "pred", F.col("intercept") + dot_expr(F.col("features"), F.col("weights"))
    ).drop("intercept", "weights")


# ------------------------------------------------------------- scoring

def score_by_group(
    scored: DataFrame, group: list[str], era: str = "era", key: str = "vec_id"
) -> DataFrame:
    """Per-group (M1 era-Spearman, M2 quartic) from (y, pred) rows —
    the reference's fit_predict result pair (metrics.py:34-42)."""
    w = Window.partitionBy(*group, era).orderBy(F.asc("pred"), F.asc(key))
    cnt = Window.partitionBy(*group, era)
    ranked = scored.withColumn(
        "pred_rank",
        F.row_number().over(w).cast("double") / F.count("*").over(cnt).cast("double"),
    )
    return ranked.groupBy(*group).agg(
        F.round(corr_safe("y", "pred_rank"), 6).alias("spearman"),
        F.round(F.avg(F.pow(F.col("y") - F.col("pred"), 4)), 6).alias("quartic"),
    )
