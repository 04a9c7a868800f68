"""Adversarial-corpus parity for log1_logistic_irls (rows-only: the
6-round Newton fit has no SQL twin).

Branches the shipped corpus never hits, forced here:
- QUASI-SEPARABLE classes (label perfectly predicted by doc length):
  the unpenalized MLE diverges, so the 6 fixed Newton steps walk the
  coefficients large while w = p(1-p) collapses toward 0 and the
  solve leans on the lam=1e-6 jitter — the numerically hardest path.
- the len_capped ceiling (docs >= 50 tokens pin the feature at 1.0),
- all-stopword docs (stop_ratio = 1) and single-repeated-token docs
  (uniq_ratio -> 1/n),
- the empty-string document: Spark's split('', ' ') = [''] gives ONE
  empty token (n=1, stop_ratio 0, uniq_ratio 1) — mirrored by
  Python's ''.split(' ') — not a NULL row.

Ground truth: an independent numpy IRLS (same Newton update, same
lam jitter, same iteration count) over features recomputed in pure
Python. The corpus is one parquet file/one Arrow batch, so the
engine's per-partition partial is a single numpy pass in row order —
the replica is bit-faithful, and the 6-dp output rounding makes the
assertion exact.
"""

from __future__ import annotations

import numpy as np

from tests.parity_util import docs_table, run_registered

STOPWORDS = ("a", "the")  # text.py contract, restated independently


def _features(text: str, lang: str) -> tuple[float, float, float, float]:
    toks = text.split(" ")  # Spark split keeps empties, incl. [''] for ''
    n = len(toks)
    return (
        min(1.0, n / 50.0),
        sum(t in STOPWORDS for t in toks) / n,
        len(set(toks)) / n,
        1.0 if lang == "en" else 0.0,
    )


def _numpy_irls(rows, iters=6, lam=1e-6) -> np.ndarray:
    feats = np.array([_features(t, l) for _, t, l in rows])
    X = np.column_stack([np.ones(len(feats)), feats[:, :3]])
    y = feats[:, 3]
    beta = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1.0 - p)
        H = X.T @ (X * w[:, None])
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(H + lam * np.eye(4), g)
    return beta


def _check(spark, tmp_path, rows):
    got = run_registered(
        spark, tmp_path, "log1_logistic_irls", {"documents": docs_table(rows)}
    ).set_index("term")["coef"]
    want = _numpy_irls(rows)
    names = ["intercept", "len_capped", "stop_ratio", "uniq_ratio"]
    for nm, b in zip(names, want):
        assert got[nm] == round(float(b), 6), (nm, got[nm], b)


class TestLog1AdversarialParity:
    def test_quasi_separable_fit(self, spark, tmp_path):
        """en docs all >= 50 tokens (len_capped == 1.0), non-en all
        short: length separates the classes perfectly, the MLE
        diverges, and the 6 clamped Newton steps must match numpy
        bit-for-bit through the near-singular solves."""
        rows = []
        for i in range(8):
            rows.append((i, " ".join(f"w{i}x{j}" for j in range(55)), "en"))
        for i in range(8, 16):
            rows.append((i, f"short doc {i}", "xx"))
        _check(spark, tmp_path, rows)

    def test_degenerate_feature_docs(self, spark, tmp_path):
        """All-stopword docs, single-repeated-token docs, the empty
        string, and a mixed-label overlap so the fit stays finite but
        every feature hits an extreme at least once."""
        rows = [
            (0, "a the a the a the", "en"),      # stop_ratio = 1
            (1, "a the a the a the", "xx"),      # same x, other label
            (2, "tok tok tok tok tok tok", "en"),  # uniq_ratio = 1/6
            (3, "tok tok tok tok tok tok", "xx"),
            (4, "", "en"),                        # [''] single empty token
            (5, "", "xx"),
            (6, "all distinct words here now", "en"),
            (7, "other entirely fresh tokens too", "xx"),
            (8, " ".join(["the"] * 60), "en"),    # cap AND stop_ratio 1
            (9, "z " * 3 + "z", "xx"),            # 'z z z z' - low uniq
        ]
        _check(spark, tmp_path, rows)

    def test_constant_label(self, spark, tmp_path):
        """One class only: the intercept walks toward +inf along the
        separating direction while every weight stays determined by
        the jittered solve — numpy must agree exactly."""
        rows = [(i, f"doc number {i} with words", "en") for i in range(10)]
        _check(spark, tmp_path, rows)
