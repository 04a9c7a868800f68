"""Round-4 operators: canonical selection (canon1)."""

from __future__ import annotations

import pytest

from .conftest import SF_SMALL


class TestCanonicalSelection:
    @pytest.fixture(scope="class")
    def canon(self, spark):
        from reduction_dask_spark.operators.dedup import canon1_canonical_selection

        return canon1_canonical_selection(spark, SF_SMALL).toPandas()

    def test_exactly_one_canonical_per_cluster(self, canon):
        per = canon.groupby("cluster_id").is_canonical.sum()
        assert (per == 1).all()

    def test_canonical_is_best_quality(self, canon):
        best = canon.groupby("cluster_id").quality.transform("max")
        chosen = canon[canon.is_canonical]
        assert (chosen.quality == best[chosen.index]).all()

    def test_every_doc_labeled_once(self, canon):
        assert canon.doc_id.is_unique and len(canon) > 0

    def test_clusters_exist_beyond_singletons(self, canon):
        sizes = canon.groupby("cluster_id").size()
        assert (sizes > 1).any()  # testdata plants near-dups
