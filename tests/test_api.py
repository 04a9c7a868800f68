"""Reference-parity facade: every reference entry point is callable
with DataFrame-shaped inputs and returns sane results."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from reduction_dask_spark import api
from reduction_dask_spark.ml import supervised_frame
from reduction_dask_spark.operators.cv import kfold_era
from reduction_dask_spark.operators.metrics import scored_events

from .conftest import SF_SMALL


def test_spearman_rank_and_quartic(spark):
    scored = scored_events(spark, SF_SMALL)
    s = api.spearman_rank(scored)
    q = api.quartic_error(scored)
    assert 0.5 < s <= 1.0  # pred = value + bounded noise → strong corr
    assert 0 < q < 1


def test_fit_predict_and_kfold_dask(spark):
    folded = kfold_era(supervised_frame(spark, SF_SMALL), "era", k=5)
    per_fold = api.fit_predict(folded)
    mean_s, (q25, q75), mean_q = api.kfold_dask(per_fold)
    assert q25 <= mean_s or q25 <= q75  # quartiles bracket sensibly
    assert mean_s > 0.8
    assert np.isfinite(mean_q)


def test_payout(spark):
    scored = scored_events(spark, SF_SMALL).withColumn(
        "score", (F.col("pred") - F.col("y_true"))
    )
    out = api.payout(scored, "score").select("payout").toPandas()
    assert out["payout"].between(-1, 1).all()


def test_select_top_features(spark):
    df = supervised_frame(spark, SF_SMALL)
    out = api.select_top_features(df, [5, 2, 9, 0], n=2)
    row = out.select("features").first()
    assert len(row["features"]) == 2


def test_variation_of_information_facade(spark):
    from reduction_dask_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events")
    vi_self = api.variation_of_information(ev, F.col("value"), F.col("value"))
    assert abs(vi_self) < 1e-9  # VI(x,x) = 0
    vi_other = api.variation_of_information(
        ev, F.col("value"), (F.col("value") * -1 + 500)
    )
    assert vi_other >= 0


def test_fit_transform_facade(spark):
    out = api.fit_transform(spark, SF_SMALL, n_components=2)
    assert {"pc1", "pc2"} <= set(out.columns)
    assert out.count() == supervised_frame(spark, SF_SMALL).count()
