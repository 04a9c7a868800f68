"""Semantic tests for the round-3 operators: hybrid retrieval fusion,
time-series gap fill, trailing range windows, unpivot reshaping.
(Oracle equality is covered by tools/compare.py; these pin the
operator-specific invariants a value hash can't express.)"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from reduction_dask_spark.operators.retrieval import (
    RRF_K,
    RRF_L,
    RRF_TOPK,
    _lex_ranked,
    _vec_ranked,
    rrf1_hybrid_retrieval,
)
from reduction_dask_spark.operators.temporal import (
    ts1_gap_fill_locf,
    w7_trailing_range_window,
)
from reduction_dask_spark.operators.relational import unpivot1_melt_measures
from reduction_dask_spark.sources import load_table

SF = "/root/testdata/sf0.001"


class TestRRF:
    def test_fused_score_is_rrf_of_component_ranks(self, spark):
        out = rrf1_hybrid_retrieval(spark, SF).toPandas()
        for _, r in out.iterrows():
            expect = 0.0
            if pd.notna(r.lex_rank):
                expect += 1.0 / (RRF_K + r.lex_rank)
            if pd.notna(r.vec_rank):
                expect += 1.0 / (RRF_K + r.vec_rank)
            assert abs(r.rrf - round(expect, 6)) < 1e-9

    def test_topk_per_query_and_rank_bounds(self, spark):
        out = rrf1_hybrid_retrieval(spark, SF).toPandas()
        assert out.groupby("qid").size().max() <= RRF_TOPK
        assert out.lex_rank.dropna().between(1, RRF_L).all()
        assert out.vec_rank.dropna().between(1, RRF_L).all()
        # no self-hits in either list
        assert (out.qid != out.doc_id).all()

    def test_dual_evidence_outranks_single_list(self, spark):
        """A doc in BOTH lists at rank r beats a doc in one list at r:
        fusion's defining property."""
        lex = _lex_ranked(load_table(spark, SF, "documents")).toPandas()
        vec = _vec_ranked(load_table(spark, SF, "embeddings")).toPandas()
        both = lex.merge(vec, on=["qid", "doc_id"])
        out = rrf1_hybrid_retrieval(spark, SF).toPandas()
        if len(both):
            q, d = both.iloc[0].qid, both.iloc[0].doc_id
            fused_q = out[out.qid == q]
            only = fused_q[fused_q.lex_rank.isna() | fused_q.vec_rank.isna()]
            hit = fused_q[(fused_q.doc_id == d)]
            if len(hit) and len(only):
                worst_single = only.rrf.max()
                r = max(both.iloc[0].lex_rank, both.iloc[0].vec_rank)
                if 2.0 / (RRF_K + r) > worst_single:
                    assert hit.rrf.iloc[0] >= worst_single


class TestGapFill:
    def test_spine_is_contiguous_per_user(self, spark):
        out = ts1_gap_fill_locf(spark, SF).toPandas()
        for uid, g in out.groupby("user_id"):
            hours = g.sort_values("hour").hour
            deltas = hours.diff().dropna()
            assert (deltas == pd.Timedelta(hours=1)).all(), uid

    def test_locf_fills_every_gap_after_first_hour(self, spark):
        out = ts1_gap_fill_locf(spark, SF).toPandas()
        # bounds run min..max of ACTIVE hours, so the first spine row is
        # always observed → filled_value never null
        assert out.filled_value.notna().all()
        for _, g in out.groupby("user_id"):
            g = g.sort_values("hour")
            last = None
            for _, r in g.iterrows():
                if not r.is_gap:
                    last = r.filled_value
                else:
                    assert r.filled_value == last

    def test_gap_flag_matches_counts(self, spark):
        out = ts1_gap_fill_locf(spark, SF).toPandas()
        assert ((out.n_events == 0) == out.is_gap).all()


class TestTrailingRange:
    def test_matches_pandas_rolling(self, spark):
        ev = load_table(spark, SF, "events").select("event_id", "user_id", "ts", "value").toPandas()
        out = w7_trailing_range_window(spark, SF).toPandas().set_index("event_id")
        one = ev[ev.user_id == ev.user_id.iloc[0]].sort_values("ts")
        for _, r in one.iterrows():
            win = one[(one.ts <= r.ts) & (one.ts >= r.ts - pd.Timedelta(hours=1))]
            assert out.loc[r.event_id, "n_1h"] == len(win)
            assert abs(out.loc[r.event_id, "sum_1h"] - round(win.value.sum(), 2)) < 1e-6

    def test_self_always_included(self, spark):
        out = w7_trailing_range_window(spark, SF).toPandas()
        assert (out.n_1h >= 1).all()


class TestUnpivot:
    def test_shape_and_roundtrip(self, spark):
        li = load_table(spark, SF, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
        n = li.count()
        out = unpivot1_melt_measures(spark, SF)
        assert out.count() == 4 * n
        cols = ["l_orderkey", "l_linenumber",
                "l_discount", "l_extendedprice", "l_quantity", "l_tax"]
        back = (
            out.groupBy("l_orderkey", "l_linenumber")
            .pivot("measure")
            .agg(F.first("val"))
            .select(*cols)
        )
        wide = li.select(
            "l_orderkey", "l_linenumber",
            *[F.round(c, 6).alias(c) for c in cols[2:]],
        )
        assert back.exceptAll(wide).count() == 0
