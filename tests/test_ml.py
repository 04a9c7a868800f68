"""ML harness semantics vs direct numpy ground truth."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from reduction_dask_spark.ml import (
    DIM,
    coef_frame,
    fit_fold_models,
    fit_global_model,
    fold_suffstats,
    ridge_solve,
    score_by_group,
    supervised_frame,
    with_prediction,
)
from reduction_dask_spark.operators.cv import kfold_era

from .conftest import SF_SMALL

LAM = 1.0


def _folded_pdf(spark):
    df = kfold_era(supervised_frame(spark, SF_SMALL), "era", k=5)
    pdf = df.toPandas()
    X = np.stack(pdf["features"].to_numpy()).astype(float)
    X1 = np.hstack([np.ones((len(X), 1)), X])
    y = pdf["y"].to_numpy(dtype=float)
    return df, pdf, X1, y


def test_global_ridge_matches_numpy(spark):
    df, pdf, X1, y = _folded_pdf(spark)
    stats = fold_suffstats(df)
    coef = fit_global_model(stats, LAM)
    pen = np.eye(DIM + 1) * LAM
    pen[0, 0] = 0.0
    expected = np.linalg.solve(X1.T @ X1 + pen, X1.T @ y)
    np.testing.assert_allclose(coef, expected, rtol=1e-8)


def test_fold_models_are_leave_one_out(spark):
    df, pdf, X1, y = _folded_pdf(spark)
    stats = fold_suffstats(df)
    models = fit_fold_models(stats, LAM)
    assert set(models) == set(pdf["fold"].unique())
    for fold, coef in models.items():
        mask = (pdf["fold"] != fold).to_numpy()
        Xt, yt = X1[mask], y[mask]
        pen = np.eye(DIM + 1) * LAM
        pen[0, 0] = 0.0
        expected = np.linalg.solve(Xt.T @ Xt + pen, Xt.T @ yt)
        np.testing.assert_allclose(coef, expected, rtol=1e-6)


def test_prediction_expression_matches_numpy(spark):
    df, pdf, X1, y = _folded_pdf(spark)
    stats = fold_suffstats(df)
    models = fit_fold_models(stats, LAM)
    scored = with_prediction(df, coef_frame(spark, models)).select("vec_id", "fold", "pred").toPandas()
    merged = scored.set_index("vec_id").loc[pdf["vec_id"]]
    for fold in models:
        m = (pdf["fold"] == fold).to_numpy()
        expected = X1[m] @ models[fold]
        np.testing.assert_allclose(merged["pred"].to_numpy()[m], expected, rtol=1e-9)


def test_cv_model_has_signal(spark):
    """Labels are cluster ids carried by the embeddings — CV Spearman
    must be clearly positive (and quartic error finite)."""
    from reduction_dask_spark.operators.tuning import kfold_cv_ridge

    per_fold = kfold_cv_ridge(spark, SF_SMALL).toPandas()
    assert len(per_fold) == 5
    assert per_fold["spearman"].mean() > 0.8  # planted signal is learnable
    assert np.isfinite(per_fold["quartic"]).all()


def test_mda_importance_finds_planted_features(spark):
    from reduction_dask_spark.ml import N_INFORMATIVE
    from reduction_dask_spark.operators.importance import mda_importance

    imp = mda_importance(spark, SF_SMALL).toPandas()
    assert len(imp) == DIM
    # table is sorted descending (O1)
    assert (imp["importance"].to_numpy()[:-1] >= imp["importance"].to_numpy()[1:]).all()
    # the planted informative features dominate the ranking
    top = set(imp.head(N_INFORMATIVE)["feature"])
    assert len(top & set(range(N_INFORMATIVE))) >= N_INFORMATIVE - 2
    # permutation-consistency (SURVEY.md §5.4): uninformative features ≈ 0
    noise_imp = imp[~imp["feature"].isin(range(N_INFORMATIVE))]["importance"]
    assert noise_imp.abs().max() < 0.2


def test_linear_shap_matches_numpy(spark):
    from reduction_dask_spark.operators.importance import linear_shap_scores

    df, pdf, X1, y = _folded_pdf(spark)
    coef = fit_global_model(fold_suffstats(df), LAM)
    sample = pdf.sort_values("vec_id").head(1000)
    Xs = np.stack(sample["features"].to_numpy()).astype(float)
    expected = np.abs(coef[1:] * (Xs - Xs.mean(axis=0))).mean(axis=0)
    got = linear_shap_scores(spark, SF_SMALL).toPandas().set_index("feature")["mean_abs_shap"]
    np.testing.assert_allclose(got.loc[np.arange(DIM)].to_numpy(), np.round(expected, 6), atol=2e-6)


def test_pca_transform_matches_numpy(spark):
    from reduction_dask_spark.operators.reduction import fit_pca, pca_transform

    mu, comps = fit_pca(spark, SF_SMALL, 2)
    df = supervised_frame(spark, SF_SMALL)
    got = pca_transform(df, mu, comps).select("vec_id", "pc1", "pc2").toPandas().sort_values("vec_id")
    pdf = df.toPandas().sort_values("vec_id")
    X = np.stack(pdf["features"].to_numpy()).astype(float)
    expected = (X - mu) @ comps.T
    np.testing.assert_allclose(got[["pc1", "pc2"]].to_numpy(), np.round(expected, 6), atol=2e-6)


def test_dcor_kernel():
    from reduction_dask_spark.operators.distance import _dcor

    rng = np.random.default_rng(42)
    x = rng.normal(size=200)
    assert abs(_dcor(x, x) - 1.0) < 1e-9
    assert abs(_dcor(x, -3 * x + 2) - 1.0) < 1e-9
    assert _dcor(x, rng.normal(size=200)) < 0.25
    # dcor catches nonlinear dependence that Pearson misses
    assert _dcor(x, x**2) > 0.4


def test_hyperband_trace_invariants(spark):
    from reduction_dask_spark.operators.tuning import hyperband

    trace = hyperband(spark, SF_SMALL, max_ratio=9, eta=3).toPandas()
    assert (trace.groupby(["bracket", "rung"])["kept"].sum() >= 1).all()
    # rungs shrink configs by eta within a bracket
    for b, sub in trace.groupby("bracket"):
        sizes = sub.groupby("rung")["param_id"].nunique()
        assert (sizes.diff().dropna() <= 0).all()


def test_suffstats_additivity(spark):
    df, pdf, X1, y = _folded_pdf(spark)
    stats = fold_suffstats(df)
    xtx_all = sum(s[0] for s in stats.values())
    np.testing.assert_allclose(xtx_all, X1.T @ X1, rtol=1e-9)
    assert sum(s[2] for s in stats.values()) == len(pdf)


def test_distributed_pca_matches_numpy(spark):
    from reduction_dask_spark.operators.reduction import fit_pca_distributed

    df = supervised_frame(spark, SF_SMALL)
    mu, comps = fit_pca_distributed(df, 2)
    pdf = df.toPandas()
    X = np.stack(pdf["features"].to_numpy()).astype(float)
    np.testing.assert_allclose(mu, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, np.argsort(vals)[::-1][:2]].T
    for i in range(2):  # sign-fixed comparison
        j = int(np.argmax(np.abs(top[i])))
        if top[i, j] < 0:
            top[i] = -top[i]
    np.testing.assert_allclose(np.abs(comps), np.abs(top), atol=1e-6)
    # components are orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-9)


def test_kmeans_matches_numpy_lloyd(spark):
    """Distributed Lloyd's iterations == local numpy Lloyd's from the
    same deterministic init."""
    from pyspark.sql import functions as F2

    from reduction_dask_spark.operators.similarity import (
        CENT_MOD,
        KM_ITERS,
        KM_K,
        as_double,
        kmeans_fit,
    )
    from reduction_dask_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    df = emb.select("vec_id", as_double(F2.col("embedding")).alias("vv"))
    got = kmeans_fit(df)

    pdf = df.toPandas().sort_values("vec_id")
    X = np.stack(pdf["vv"].to_numpy()).astype(float)
    ids = pdf["vec_id"].to_numpy()
    C = X[np.isin(ids, ids[(ids % CENT_MOD) == 0][:KM_K])][:KM_K].copy()
    for _ in range(KM_ITERS):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        newC = C.copy()
        for c in range(KM_K):
            if (lab == c).any():
                newC[c] = X[lab == c].mean(axis=0)
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC
    np.testing.assert_allclose(got, C, atol=1e-8)


def test_mda_suffstats_matches_rowwise(spark):
    """x1b (in-UDF sufficient-statistics scoring) must reproduce x1's
    (row-emitting) importance table: same seeds, same rank semantics,
    corr assembled from sums instead of Spark's covar/stddev."""
    from reduction_dask_spark.operators.importance import (
        mda_importance,
        mda_importance_suffstats,
    )

    a = {r["feature"]: r["importance"] for r in mda_importance(spark, SF_SMALL).collect()}
    b = {
        r["feature"]: r["importance"]
        for r in mda_importance_suffstats(spark, SF_SMALL).collect()
    }
    assert set(a) == set(b)
    for f in a:
        assert abs(a[f] - b[f]) < 1e-6, f


# ----------------------------------------------------- GBT stump kernel

def test_gbt_hist_fit_matches_numpy(spark):
    """The distributed histogram pass must equal the same boosting loop
    run on collected data — parity of the distributed part (the stump
    chooser is shared code)."""
    from reduction_dask_spark.ml import (
        GBT_BINS,
        GBT_LR,
        _best_stump,
        feature_bounds,
        fit_gbt_fold_models,
        predict_stumps,
    )

    df = kfold_era(supervised_frame(spark, SF_SMALL), "era", k=5).persist()
    pdf = df.toPandas()
    X = np.stack(pdf["features"].to_numpy()).astype(float)
    y = pdf["y"].to_numpy(dtype=float)
    fold = pdf["fold"].to_numpy()

    n_rounds = 4
    got = fit_gbt_fold_models(df, k=5, n_rounds=n_rounds)

    mn, mx = feature_bounds(df)
    bins = np.clip(((X - mn) / (mx - mn) * GBT_BINS).astype(int), 0, GBT_BINS - 1)
    for m in range(5):
        mask = fold != m
        stumps: list = []
        for _ in range(n_rounds):
            resid = y[mask] - predict_stumps(stumps, X[mask])
            hist = np.zeros((DIM, GBT_BINS))
            counts = np.zeros((DIM, GBT_BINS))
            bm = bins[mask]
            for f in range(DIM):
                hist[f] = np.bincount(bm[:, f], weights=resid, minlength=GBT_BINS)
                counts[f] = np.bincount(bm[:, f], minlength=GBT_BINS)
            stumps.append(_best_stump(hist, counts, mn, mx, GBT_LR))
        for (gf, gt, gl, gr), (ef, et, el, er) in zip(got[m], stumps):
            assert gf == ef
            np.testing.assert_allclose([gt, gl, gr], [et, el, er], rtol=1e-9)


def test_gbt_cv_has_signal(spark):
    from reduction_dask_spark.operators.tuning import kfold_cv_gbt

    per = kfold_cv_gbt(spark, SF_SMALL).toPandas()
    assert len(per) == 5
    # nonlinear kernel finds the planted (mostly linear) signal
    assert (per["spearman"] > 0.5).all()


def test_gbt_mda_recovers_planted_features(spark):
    from reduction_dask_spark.ml import N_INFORMATIVE
    from reduction_dask_spark.operators.importance import mda_importance_gbt

    imp = mda_importance_gbt(spark, SF_SMALL).toPandas()
    assert len(imp) == DIM
    nonzero = imp[imp["importance"].abs() > 1e-9]
    # every feature the stump ensemble credits is a planted one, and the
    # ensemble splits on at least half the planted set (12 stumps spread
    # over the strongest features by design)
    assert set(nonzero["feature"]) <= set(range(N_INFORMATIVE))
    assert len(nonzero) >= N_INFORMATIVE // 2
    # top-ranked feature carries a large planted weight
    assert int(imp.iloc[0]["feature"]) in range(N_INFORMATIVE)
