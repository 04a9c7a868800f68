"""Round-4 operators: canonical selection (canon1)."""

from __future__ import annotations

import pytest

from .conftest import SF_SMALL


class TestCanonicalSelection:
    @pytest.fixture(scope="class")
    def canon(self, spark):
        from reduction_dask_spark.operators.dedup import canon1_canonical_selection

        return canon1_canonical_selection(spark, SF_SMALL).toPandas()

    def test_exactly_one_canonical_per_cluster(self, canon):
        per = canon.groupby("cluster_id").is_canonical.sum()
        assert (per == 1).all()

    def test_canonical_is_best_quality(self, canon):
        best = canon.groupby("cluster_id").quality.transform("max")
        chosen = canon[canon.is_canonical]
        assert (chosen.quality == best[chosen.index]).all()

    def test_every_doc_labeled_once(self, canon):
        assert canon.doc_id.is_unique and len(canon) > 0

    def test_clusters_exist_beyond_singletons(self, canon):
        sizes = canon.groupby("cluster_id").size()
        assert (sizes > 1).any()  # testdata plants near-dups


class TestIsotonicCalibration:
    def test_matches_numpy_pav(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from reduction_dask_spark.operators.reduction import (
            iso1_isotonic_calibration,
        )
        from reduction_dask_spark.operators.text import STOPWORDS, tokens
        from reduction_dask_spark.sources import load_table

        curve = iso1_isotonic_calibration(spark, SF_SMALL).toPandas()
        # ground truth: tie-aggregate labels per distinct score, then
        # classic pool-adjacent-violators
        d = load_table(spark, SF_SMALL, "documents")
        toks = tokens(F.col("text"))
        n = F.size(toks)
        stop_ratio = (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
        )
        uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
        quality = (
            F.least(F.lit(1.0), n / F.lit(50.0))
            * (F.lit(1.0) - stop_ratio)
            * uniq_ratio
        )
        pdf = d.select(
            quality.alias("x"), (F.col("lang") == "en").cast("double").alias("y")
        ).toPandas()
        g = pdf.groupby("x").agg(y=("y", "mean"), w=("y", "size")).reset_index()
        xs = g.x.to_numpy()
        ys = list(g.y.to_numpy())
        ws = list(g.w.to_numpy(dtype=float))
        vals, wts, idx = [], [], []
        for yi, wi in zip(ys, ws):
            vals.append(yi); wts.append(wi); idx.append(1)
            while len(vals) > 1 and vals[-2] >= vals[-1]:
                v = (vals[-2] * wts[-2] + vals[-1] * wts[-1]) / (wts[-2] + wts[-1])
                w2 = wts[-2] + wts[-1]
                k = idx[-2] + idx[-1]
                vals = vals[:-2] + [v]; wts = wts[:-2] + [w2]; idx = idx[:-2] + [k]
        fitted = np.concatenate([np.full(k, v) for v, k in zip(vals, idx)])
        fit_at = dict(zip(xs, fitted))
        assert len(curve) >= 2
        # monotone non-decreasing curve
        assert (np.diff(curve.calibrated.to_numpy()) >= -1e-9).all()
        for b, c in zip(curve.boundary, curve.calibrated):
            # every MLlib boundary is a data point; its prediction is
            # the PAV pool value there
            key = min(fit_at, key=lambda x: abs(x - b))
            assert abs(key - b) < 1e-9
            assert abs(fit_at[key] - c) < 1e-5
