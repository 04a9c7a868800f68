"""Adversarial-corpus parity for d3_distance_corr (rows-only: the
O(n^2) double-centered pair kernel has no SQL twin).

Branches the shipped embeddings never hit, forced here:
- a CONSTANT feature column: distance variance 0, the denom > 0 guard
  must return exactly 0.0 against every other column;
- an exact LINEAR DEPENDENCE (f2 = 3*f1 - 1): distance correlation is
  exactly 1.0 (invariant to affine maps of either variable);
- the n_sample CAP: vec_ids >= 100 must be excluded from the
  statistic (a planted outlier there would shift every value);
- duplicate sample rows (zero distance rows inside the kernel).

Ground truth: distance correlation recomputed in the test from the
Szekely-Rizzo definition (pairwise |x_i - x_j| matrices, explicit
double centering via the centering matrix J = I - 11'/n, so the
formulation differs from the operator's mean-subtraction code path),
rounded to the operator's 6 dp.
"""

from __future__ import annotations

import numpy as np

from tests.parity_util import emb_table, run_registered

N_SAMPLE, N_FEATS = 100, 8  # distance.py d3 contract, restated


def _dcor_ref(x, y):
    """Szekely-Rizzo dCor via the centering-matrix formulation."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = len(x)
    J = np.eye(n) - np.ones((n, n)) / n
    A = J @ np.abs(x[:, None] - x[None, :]) @ J
    B = J @ np.abs(y[:, None] - y[None, :]) @ J
    dcov2 = (A * B).mean()
    denom = np.sqrt((A * A).mean() * (B * B).mean())
    return float(np.sqrt(max(dcov2, 0.0) / denom)) if denom > 0 else 0.0


def _check(spark, tmp_path, vectors):
    got = run_registered(
        spark, tmp_path, "d3_distance_corr",
        {"embeddings": emb_table([(i, [float(x) for x in v]) for i, v in vectors])},
    )
    X = np.array(
        [v[:N_FEATS] for i, v in vectors if i < N_SAMPLE], dtype=np.float64
    )
    # float32 storage: the engine reads array<float> and widens
    X = X.astype(np.float32).astype(np.float64)
    want = {
        (fi, fj): round(_dcor_ref(X[:, fi], X[:, fj]), 6)
        for fi in range(N_FEATS)
        for fj in range(fi + 1, N_FEATS)
    }
    got_map = {(int(r.fi), int(r.fj)): r.dcor for r in got.itertuples()}
    assert got_map == want, {
        k: (got_map.get(k), want.get(k))
        for k in set(got_map) | set(want)
        if got_map.get(k) != want.get(k)
    }


class TestD3AdversarialParity:
    def test_constant_linear_and_cap(self, spark, tmp_path):
        rng = np.random.RandomState(7)
        vectors = []
        for i in range(40):
            base = rng.randn(8)
            base[0] = 2.5                    # f0 constant -> dcor 0
            base[2] = 3.0 * base[1] - 1.0    # f2 affine in f1 -> dcor 1
            vectors.append((i, list(base)))
        # duplicate sample rows (zero-distance pairs in the kernel)
        vectors.append((40, vectors[0][1]))
        vectors.append((41, vectors[0][1]))
        # beyond the cap: a huge outlier that would dominate every
        # statistic if the vec_id < 100 filter were missing
        vectors.append((150, [1e6] * 8))
        got = _check(spark, tmp_path, vectors)

    def test_tiny_sample(self, spark, tmp_path):
        """n=3 rows: the smallest non-degenerate kernel input."""
        vectors = [
            (0, [1.0, 4.0, 9.0, 0.0, 1.0, 2.0, 3.0, 4.0]),
            (1, [2.0, 5.0, 7.0, 0.0, 2.0, 1.0, 3.0, 5.0]),
            (2, [3.0, 6.0, 8.0, 0.0, 3.0, 3.0, 3.0, 6.0]),
        ]
        _check(spark, tmp_path, vectors)
