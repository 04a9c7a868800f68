"""Property-based tests (hypothesis) for the engine's pure kernels —
SURVEY.md §5.4: rank/permutation/importance invariants that must hold
for ANY input, not just the fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from reduction_dask_spark.functions import KNUTH


# ---- portable hash --------------------------------------------------

@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=2, max_value=10**6))
def test_phash_range_and_determinism(x, mod):
    h = (x * KNUTH) % mod
    assert 0 <= h < mod
    assert h == (x * KNUTH) % mod


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=100, max_size=500, unique=True))
def test_phash_spreads_keys(keys):
    """The sample gate (P6) must select ≈ the requested fraction."""
    sel = [k for k in keys if (k * KNUTH) % 100 < 20]
    assert 0.02 <= len(sel) / len(keys) <= 0.45


# ---- W1 pct-rank semantics -----------------------------------------

@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.floats(-100, 100, allow_nan=False)),
        min_size=2,
        max_size=200,
    )
)
@settings(max_examples=50)
def test_row_number_rank_equals_pandas_first(rows):
    """row_number/count over (value, key) == pandas rank(pct=True,
    method='first') — the W1 equivalence (metrics.py:19) as pure logic."""
    pdf = pd.DataFrame(rows, columns=["era", "v"]).reset_index(names="key")
    expected = pdf.groupby("era")["v"].rank(pct=True, method="first")
    out = np.empty(len(pdf))
    for era, sub in pdf.groupby("era"):
        order = sub.sort_values(["v", "key"], kind="mergesort")
        ranks = pd.Series(np.arange(1, len(sub) + 1) / len(sub), index=order.index)
        out[sub.index] = ranks[sub.index]
    np.testing.assert_allclose(out, expected.to_numpy(), atol=1e-12)


# ---- ridge solve ----------------------------------------------------

@given(st.integers(0, 2**31 - 1))
@settings(max_examples=25)
def test_ridge_solve_recovers_planted_coefs(seed):
    from reduction_dask_spark.ml import ridge_solve

    rng = np.random.default_rng(seed)
    X = np.hstack([np.ones((80, 1)), rng.normal(size=(80, 4))])
    w = rng.normal(size=5)
    y = X @ w
    got = ridge_solve(X.T @ X, X.T @ y, lam=1e-10)
    np.testing.assert_allclose(got, w, atol=1e-5)


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=25)
def test_suffstat_additivity_property(seed):
    """XtX of a union is the sum of the parts — the identity the
    one-pass k-fold fit rests on."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(30, 5))
    B = rng.normal(size=(20, 5))
    both = np.vstack([A, B])
    np.testing.assert_allclose(A.T @ A + B.T @ B, both.T @ both, atol=1e-9)


# ---- dcor -----------------------------------------------------------

@given(st.integers(0, 2**31 - 1))
@settings(max_examples=20)
def test_dcor_bounds_and_invariance(seed):
    from reduction_dask_spark.operators.distance import _dcor

    rng = np.random.default_rng(seed)
    x = rng.normal(size=60)
    y = rng.normal(size=60)
    d = _dcor(x, y)
    assert 0.0 <= d <= 1.0
    # affine invariance
    assert abs(_dcor(2 * x + 3, y) - d) < 1e-8


@given(
    st.lists(st.integers(min_value=1, max_value=256), min_size=1, max_size=400),
)
@settings(max_examples=60, deadline=None)
def test_bfd_pack_invariants(sizes):
    """Best-fit-decreasing packing (pack2's kernel): every item placed
    once, no bin over budget, and the first-fit property — at most one
    bin at most half full."""
    from reduction_dask_spark.operators.pipeline import PACK_BUDGET, _bfd_pack

    arr = np.sort(np.asarray(sizes, dtype=np.int64))[::-1]
    n_docs, fill = _bfd_pack(arr)
    assert n_docs.sum() == len(sizes)
    assert fill.sum() == arr.sum()
    assert (fill <= PACK_BUDGET).all()
    assert (2 * fill <= PACK_BUDGET).sum() <= 1
    # decreasing-order guarantee: bins <= ceil(11/9 * lower) + 1
    import math

    lower = math.ceil(arr.sum() / PACK_BUDGET)
    assert len(fill) <= math.ceil(11 / 9 * lower) + 1


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_hdbscan_noise_and_determinism_property(seed):
    """HDBSCAN on random point sets: labels are a valid clustering
    (every cluster >= min_cluster_size, ids dense from 0), and the
    algorithm is deterministic."""
    from reduction_dask_spark.operators.distance import _hdbscan

    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 40))
    X = rng.normal(size=(n, 3))
    if seed % 2:
        # exact-duplicate points: zero mutual-reachability merges must
        # not distort the excess-of-mass selection (split λs clamp to
        # the same cap as point fall-outs)
        k = int(rng.integers(1, max(2, n // 3)))
        X[rng.choice(n, size=k, replace=False)] = X[int(rng.integers(n))]
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    mcs = int(rng.integers(2, 5))
    labels = _hdbscan(D, min_cluster_size=mcs, min_samples=2)
    assert (labels == _hdbscan(D, min_cluster_size=mcs, min_samples=2)).all()
    uniq = sorted(set(labels.tolist()) - {-1})
    assert uniq == list(range(len(uniq)))
    for c in uniq:
        assert (labels == c).sum() >= mcs
