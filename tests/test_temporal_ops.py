"""Invariants for scd2 (type-2 history) and an3 (transition matrix)."""

from __future__ import annotations

from collections import defaultdict

from reduction_dask_spark.operators.temporal import (
    an3_event_transitions,
    scd2_type2_history,
)

from .conftest import SF_SMALL


def test_scd2_intervals_contiguous_and_versioned(spark):
    rows = scd2_type2_history(spark, SF_SMALL).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        # versions are 1..n dense
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        # exactly one open (current) interval, and it is the last
        assert [r["is_current"] for r in ivs] == [0] * (len(ivs) - 1) + [1]
        # intervals chain: valid_to == next valid_from, no overlap/gap
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] < a["valid_to"]
        # consecutive statuses differ (no-op updates compressed)
        for a, b in zip(ivs, ivs[1:]):
            assert a["status"] != b["status"]


def test_an3_rows_are_probabilities(spark):
    rows = an3_event_transitions(spark, SF_SMALL).collect()
    assert rows
    by_from = defaultdict(float)
    for r in rows:
        assert r["n"] >= 1
        assert 0.0 < r["p"] <= 1.0
        by_from[r["from_type"]] += r["p"]
    for tot in by_from.values():
        assert abs(tot - 1.0) < 1e-4  # rounding to 6dp per row
