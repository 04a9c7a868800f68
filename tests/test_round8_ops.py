"""Ground truths for the round-8 additions: mw4 (DoReMi-shaped
mixture weights) and the restructured pipe1 funnel's flag
monotonicity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from reduction_dask_spark.operators.pipeline import doc_survival_flags
from reduction_dask_spark.operators.text import (
    DOREMI_LAM,
    mw4_doremi_mixture,
)

from .conftest import SF_SMALL


def _half_up(x: np.ndarray) -> np.ndarray:
    """round() on both engines is HALF_UP for positives; np.round is
    banker's — emulate the engines."""
    return np.floor(x + 0.5)


def test_mw4_matches_numpy(spark):
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    toks = docs["text"].str.split(" ")
    ratio = toks.map(lambda t: len(set(t)) / len(t)).values
    loss_q = _half_up(-np.log(ratio) * 1e6).astype("int64")
    d = pd.DataFrame({"lang": docs["lang"], "q": loss_q})
    g = d.groupby("lang").agg(n_docs=("q", "size"), sq=("q", "sum"))
    n, tq = g.n_docs.sum(), g.sq.sum()
    mean_loss = g.sq / (g.n_docs * 1e6)
    excess = np.maximum(0.0, mean_loss - tq / (n * 1e6))
    share = g.n_docs / n
    w = share * np.exp(DOREMI_LAM * excess)
    weight = w / w.sum()

    got = {r["lang"]: r for r in mw4_doremi_mixture(spark, SF_SMALL).collect()}
    assert set(got) == set(g.index)
    for lang in g.index:
        r = got[lang]
        assert r["n_docs"] == g.n_docs[lang]
        assert abs(r["mean_loss"] - mean_loss[lang]) < 2e-6
        assert abs(r["excess"] - excess[lang]) < 2e-6
        assert abs(r["weight"] - weight[lang]) < 2e-6
    # normalized mixture: weights sum to 1 (up to display rounding)
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-4
    # EG upweights above-reference domains: weight/share grows with excess
    # (weights carry 6-decimal display rounding — dividing by a small
    # share amplifies that to ~1e-5, hence the slack)
    ordered = sorted(g.index, key=lambda l: excess[l])
    ratios = [got[l]["weight"] / share[l] for l in ordered]
    assert all(b >= a - 1e-4 for a, b in zip(ratios, ratios[1:]))


def test_pipe1_flags_monotone(spark):
    """Each funnel stage only narrows the previous one — guards the
    r8 window-min/pin restructure of doc_survival_flags."""
    rows = doc_survival_flags(spark, SF_SMALL).collect()
    assert rows
    chain = ["q_ok", "gopher_ok", "rep_ok", "exact_ok", "near_ok", "decontam_ok", "lang_ok"]
    for r in rows:
        for a, b in zip(chain, chain[1:]):
            assert not (r[b] and not r[a]), (r["doc_id"], a, b)
    # the funnel actually filters: strictly fewer lang survivors than docs
    assert sum(r["lang_ok"] for r in rows) < len(rows)
    assert sum(r["q_ok"] for r in rows) > 0
