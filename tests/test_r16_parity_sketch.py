"""Adversarial-corpus parity for a10_approx_stats and
hll1_sketch_rollup (rows-only: sketch bytes are engine-specific).

Branches the shipped events never hit, forced here:
- a SINGLE-USER event type: both HLL++ (a10) and DataSketches HLL
  (hll1) are exact at degenerate cardinality — the estimates must
  EQUAL 1 (and 0 for empty), not approximate them; mid-size
  cardinalities hold to the documented rsd tolerance (Spark's HLL++
  already reads 49 at a true 50);
- NULL user_ids: ignored by every distinct-count path (a type whose
  events are ALL null-user must estimate 0);
- NULL values in the percentile column: skipped, so the approx median
  of [null, null, 7.0] is exactly 7.0;
- a CONSTANT value column: any percentile sketch must return that
  constant exactly;
- users recurring across MANY days (hll1's union must deduplicate
  across daily sketches: rolled-up estimate == direct single-sketch
  estimate, and at small n == the exact distinct count);
- a single-day type (n_days == 1 rollup path).

Ground truth: exact COUNT(DISTINCT)/median computed in Python. At
these cardinalities (<= a few hundred) both sketch families operate
in their exact sparse regimes, so the assertions are equalities, not
tolerances — any regression to a lossy path would surface."""

from __future__ import annotations

from datetime import datetime

from tests.parity_util import run_registered

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(rows):
    return (rows, SCHEMA)


def _mk(eid, day, user, etype, value):
    return (eid, datetime(2024, 3, day, 12, 0, 0), user, etype, value, "{}")


class TestA10AdversarialParity:
    def test_exact_sparse_regime(self, spark, tmp_path):
        rows = (
            # 'solo': one user, 200 events, constant value
            [_mk(i, 1 + i % 5, 7, "solo", 42.5) for i in range(200)]
            # 'ghost': every user_id NULL; median over [null, null, 7]
            + [_mk(300, 1, None, "ghost", None),
               _mk(301, 2, None, "ghost", None),
               _mk(302, 3, None, "ghost", 7.0)]
            # 'crowd': 50 distinct users, values 0..49
            + [_mk(400 + u, 1 + u % 7, 1000 + u, "crowd", float(u))
               for u in range(50)]
        )
        got = run_registered(
            spark, tmp_path, "a10_approx_stats", {"events": _events(rows)}
        ).set_index("event_type")
        assert int(got.loc["solo", "approx_users"]) == 1
        assert got.loc["solo", "approx_median"] == 42.5
        assert int(got.loc["ghost", "approx_users"]) == 0
        assert got.loc["ghost", "approx_median"] == 7.0
        # Spark's HLL++ is approximate even at n=50 (default rsd 5%;
        # observed 49): hold it to the documented tolerance, unlike
        # the degenerate 1/0 cardinalities above which ARE exact
        assert abs(int(got.loc["crowd", "approx_users"]) - 50) <= 3
        # percentile_approx at default accuracy is exact for 50 rows
        assert got.loc["crowd", "approx_median"] in (24.0, 25.0)


class TestHll1AdversarialParity:
    def test_rollup_equals_exact_in_sparse_regime(self, spark, tmp_path):
        rows = (
            # 'recur': 30 users, EACH active on all 10 days (300 rows):
            # naive per-day sum would be 300, the union must say 30
            [_mk(d * 100 + u, 1 + d, 500 + u, "recur", 1.0)
             for d in range(10) for u in range(30)]
            # 'oneday': single day, 12 users
            + [_mk(5000 + u, 14, 900 + u, "oneday", 1.0) for u in range(12)]
            # 'ghost': null users on 3 days -> empty sketches, est 0
            + [_mk(6000 + d, 20 + d, None, "ghost", 1.0) for d in range(3)]
        )
        got = run_registered(
            spark, tmp_path, "hll1_sketch_rollup", {"events": _events(rows)}
        ).set_index("event_type")
        assert int(got.loc["recur", "n_days"]) == 10
        assert int(round(got.loc["recur", "est_users"])) == 30
        assert int(got.loc["oneday", "n_days"]) == 1
        assert int(round(got.loc["oneday", "est_users"])) == 12
        assert int(got.loc["ghost", "n_days"]) == 3
        assert int(round(got.loc["ghost", "est_users"])) == 0
