"""P9 permutation invariants (SURVEY.md §5.3)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from reduction_dask_spark.functions import era_events, pred_events
from reduction_dask_spark.operators.permutation import permute_column
from reduction_dask_spark.sources import load_table

from .conftest import SF_SMALL


def _base(spark):
    ev = load_table(spark, SF_SMALL, "events")
    return ev.select(era_events().alias("era"), "event_id", pred_events().alias("pred"))


def test_multiset_preserved_per_group(spark):
    base = _base(spark)
    perm = permute_column(base, "era", "pred", "event_id")
    before = Counter((r["era"], round(r["pred"], 9)) for r in base.collect())
    after = Counter((r["era"], round(r["pred"], 9)) for r in perm.collect())
    assert before == after


def test_rows_and_keys_unchanged(spark):
    base = _base(spark)
    perm = permute_column(base, "era", "pred", "event_id")
    assert perm.count() == base.count()
    assert perm.select("event_id").distinct().count() == base.count()


def test_actually_permutes(spark):
    base = _base(spark)
    perm = permute_column(base, "era", "pred", "event_id")
    j = base.alias("a").join(perm.alias("b"), "event_id").filter(
        F.col("a.pred") != F.col("b.pred")
    )
    # the vast majority of rows must have moved
    assert j.count() > base.count() * 0.9


def test_seed_changes_permutation(spark):
    base = _base(spark)
    p1 = permute_column(base, "era", "pred", "event_id", seed=1)
    p2 = permute_column(base, "era", "pred", "event_id", seed=2)
    diff = p1.alias("a").join(p2.alias("b"), "event_id").filter(
        F.col("a.pred") != F.col("b.pred")
    )
    assert diff.count() > 0
