"""Adversarial-corpus parity for km1_kmeans_quantizer (rows-only: the
iterative Lloyd fit has no SQL twin).

Branches the shipped embeddings never hit, forced here:
- EMPTY CLUSTER: two hash-eligible seeds (vec_id 0 and 53) carry
  IDENTICAL vectors, so both centroids start equal, every point —
  including both seeds — assigns to the lower cid (numpy argmin takes
  the first minimum), and the duplicate centroid receives zero members
  every iteration: the `new_centroids = centroids.copy()` keep-old
  branch must fire each round, and the final assignment must contain
  no member for that cid.
- FEWER ELIGIBLE SEEDS THAN k: only 3 vec_ids are ≡ 0 (mod 53) below
  the cap, so the fit runs with k=3, not KM_K=10.
- EARLY CONVERGENCE: tight, well-separated clusters converge before
  KM_ITERS — the np.allclose break must fire (the replica breaks on
  the same test, or the parity would drift on later iterations).
- ASSIGNMENT TIES: a point exactly equidistant from two centroids
  must land on the LOWEST cid (window orders by rounded d2 then cid).

Ground truth: an independent numpy Lloyd replica with the same init
(eligible vec_ids in order), same argmin tie rule, same convergence
test, evaluated in parquet row order (one file, one Arrow batch, so
the engine's per-partition np.add.at is the same single pass)."""

from __future__ import annotations

import numpy as np

from tests.parity_util import emb_table, run_registered

CENT_MOD, KM_K, KM_ITERS = 53, 10, 5  # similarity.py contract, restated


def _numpy_kmeans(rows, iters=KM_ITERS, k=KM_K):
    X = np.array([v for _, v in rows], dtype=np.float64)
    ids = np.array([i for i, _ in rows])
    elig = [j for j, (i, _) in enumerate(rows) if i % CENT_MOD == 0]
    elig = sorted(elig, key=lambda j: ids[j])[:k]
    C = X[elig].copy()
    for _ in range(iters):
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        a = d2.argmin(1)
        new = C.copy()
        for c in range(len(C)):
            if (a == c).any():
                new[c] = X[a == c].sum(0) / (a == c).sum()
        if np.allclose(new, C, atol=1e-12):
            C = new
            break
        C = new
    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    # final assignment mirrors the registered query: exact per-pair
    # squared distance, rounded to 5 dp, ties -> lowest cid
    out = {}
    for j, vid in enumerate(ids):
        exact = [round(float(((X[j] - C[c]) ** 2).sum()), 5) for c in range(len(C))]
        cid = int(np.argmin(exact))  # first minimum = lowest cid on ties
        out[int(vid)] = (cid, exact[cid])
    return out


def _check(spark, tmp_path, rows):
    got = run_registered(
        spark, tmp_path, "km1_kmeans_quantizer",
        {"embeddings": emb_table([(i, [float(x) for x in v]) for i, v in rows])},
    )
    want = _numpy_kmeans(rows)
    assert len(got) == len(rows)
    for r in got.itertuples():
        w_cid, w_d2 = want[r.vec_id]
        assert (r.cid, r.d2) == (w_cid, w_d2), (r.vec_id, (r.cid, r.d2), (w_cid, w_d2))
    return got, want


class TestKm1AdversarialParity:
    def test_empty_cluster_and_tie(self, spark, tmp_path):
        """Duplicate seeds force a permanently empty cluster; one point
        sits exactly between the two surviving centroid basins."""
        rows = [
            (0, [0.0, 0.0, 0.0, 0.0]),    # seed A
            (53, [0.0, 0.0, 0.0, 0.0]),   # seed B — identical: empty cluster
            (106, [10.0, 0.0, 0.0, 0.0]), # seed C
            (1, [0.5, 0.0, 0.0, 0.0]),
            (2, [-0.5, 0.0, 0.0, 0.0]),
            (3, [10.5, 0.0, 0.0, 0.0]),
            (4, [9.5, 0.0, 0.0, 0.0]),
            # equidistant between centroid 0 (at origin) and centroid 2
            # (at 10) -> ties on the FULL pipeline: iter-1 argmin takes
            # the first minimum, the final window takes the lowest cid
            (5, [5.0, 0.0, 0.0, 0.0]),
            # mirror of 5: keeps cluster 0's membership symmetric, so
            # its centroid NEVER leaves the origin, the duplicate seed
            # centroid stays identical, and cluster 1 stays empty every
            # iteration (ties always resolve to cid 0)
            (6, [-5.0, 0.0, 0.0, 0.0]),
        ]
        got, want = _check(spark, tmp_path, rows)
        cids = set(got["cid"])
        assert 1 not in cids  # the duplicate-seed cluster stayed empty
        assert int(got.set_index("vec_id").loc[5, "cid"]) == 0  # tie -> low cid

    def test_early_convergence_small_k(self, spark, tmp_path):
        """3 eligible seeds (k=3 < KM_K=10), clusters already centered
        on their seeds: Lloyd converges on iteration 1 and the
        allclose break fires in both engine and replica."""
        rows = []
        for base, seed in ((0.0, 0), (20.0, 53), (40.0, 106)):
            rows.append((seed, [base, base, 0.0, 0.0]))
            for off, vid in ((1.0, seed + 1), (-1.0, seed + 2)):
                rows.append((vid, [base + off, base, 0.0, 0.0]))
        # symmetric +-1 flankers: the mean IS the seed, so iteration 1
        # reproduces the init exactly and the break triggers
        _check(spark, tmp_path, rows)
