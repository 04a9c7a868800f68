"""Exact-duplicate quotient ≡ direct computation (r12).

The quotient rewrites (jaccard_pairs_collapsed behind dd2/dd7, the
combinatorial triangle counts behind gr2) are EXECUTION quotients —
their contract is bit-identical output to the uncollapsed plans. The
×12 replica gates pin that on the shipped corpora; these tests pin it
on an adversarial synthetic corpus that hits every branch at pytest
speed: multi-way duplicate groups of several sizes (2/3/5), singleton
near-dup neighbors, chain AND clique shapes in the near-dup graph, a
>DF_CAP duplicate group (its shingles are capped away, so its members
must NOT self-pair — the full-corpus-df subtlety), and ≤2-token docs
(no shingles ⇒ no intra pairs despite being duplicates).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark):
    from reduction_dask_spark.operators.dedup import DF_CAP

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",  # near-dup of 0
        "alpha beta gamma delta epsilon zeta eta theta mu nu",        # near-dup chain
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine eleven",        # near-dup of 3
        "totally different words here nothing shared with others at all",
        "short doc",                                                   # < K_SHINGLE tokens
    ]
    rows = []
    doc_id = 0
    # dup multiplicities per base text: clique/chain shapes survive
    for text, mult in zip(base, (3, 2, 1, 5, 1, 2, 4)):
        for _ in range(mult):
            rows.append((doc_id, text))
            doc_id += 1
    # a duplicate group bigger than DF_CAP: every one of its shingles
    # has full-corpus df > cap, so the capped index drops them and the
    # group must not self-pair in EITHER plan
    hot_text = "hot boiler plate sentence repeated across the whole crawl forever"
    for _ in range(DF_CAP + 20):
        rows.append((doc_id, hot_text))
        doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def _direct_pairs(d, tau):
    from reduction_dask_spark.operators.dedup import (
        jaccard_pairs,
        shingle_table_of,
    )

    return jaccard_pairs(shingle_table_of(d), tau)


def test_jaccard_pairs_collapsed_matches_direct(spark):
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.operators.dedup import jaccard_pairs_collapsed

    d = _corpus(spark)
    tau = 0.5
    want = sorted(map(tuple, _direct_pairs(d, tau).collect()))
    got = sorted(map(tuple, jaccard_pairs_collapsed(d, tau).collect()))
    assert len(want) >= 30  # dup groups actually expanded
    assert sum(1 for r in want if r[2] == 1.0) >= 10  # intra-dup pairs present
    assert got == want
    release_pinned()
    spark.catalog.clearCache()


def test_rep_capped_shingles_matches_full_restrict(spark):
    """r14: the weighted-df rep quotient must reproduce the full-pass
    capped index restricted to representatives EXACTLY — including the
    >DF_CAP duplicate group, whose shingles reach the cap only through
    multiplicity weighting (each appears in just one distinct
    content)."""
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.operators.dedup import (
        exact_groups,
        rep_capped_shingles,
        shingle_table_of,
    )

    d = _corpus(spark)
    _, grp = exact_groups(d)
    reps = grp.select(F.col("rep_id").alias("doc_id"))
    want = sorted(
        map(tuple, shingle_table_of(d).join(reps, "doc_id", "left_semi").collect())
    )
    got = sorted(map(tuple, rep_capped_shingles(d, grp).collect()))
    assert want  # non-degenerate
    assert got == want
    # the hot group's shingles must be capped away in BOTH plans
    hot_rep = (
        grp.orderBy(F.desc("m")).limit(1).collect()[0]["rep_id"]
    )
    assert all(r[0] != hot_rep for r in got)
    release_pinned()
    spark.catalog.clearCache()


def test_minhash_collapsed_matches_direct(spark):
    """r14: dd3's minhash-LSH pipeline through the exact-dup quotient
    (jaccard_pairs_collapsed with pair_fn=minhash pipeline) must equal
    the uncollapsed run over the full corpus — same candidate buckets
    (band keys are content functions), same verified pairs, same
    jaccard values, intra-dup pairs at 1.0 with the has-a-signature
    membership rule (the >DF_CAP group must self-pair in NEITHER)."""
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.operators.dedup import (
        JACCARD_TAU,
        jaccard_pairs_collapsed,
        minhash_lsh_pairs_of,
        shingle_table_of,
    )

    d = _corpus(spark)
    want = sorted(
        map(tuple, minhash_lsh_pairs_of(shingle_table_of(d)).collect())
    )
    got = sorted(
        map(
            tuple,
            jaccard_pairs_collapsed(
                d, JACCARD_TAU, pair_fn=lambda sh, tau: minhash_lsh_pairs_of(sh)
            ).collect(),
        )
    )
    assert len(want) >= 10  # dup groups expanded through the LSH path
    assert got == want
    release_pinned()
    spark.catalog.clearCache()


def test_simhash_collapsed_matches_direct(spark, tmp_path):
    """r14: dd4 (now quotient-executed) must equal the uncollapsed
    simhash run over the full corpus — fingerprints are content
    functions, every non-null doc gets one (membership unconditional
    after the NULL filter), intra pairs at hamming 0. Drives the
    REGISTERED operator against a temp parquet dir so the test covers
    dd4's actual body. r15 (r14 ADVICE): the corpus gains THREE
    NULL-text docs — the uncollapsed plan drops them (split(NULL)
    explodes to nothing, no fingerprint), while md5(NULL) would glue
    them into one phantom exact group self-pairing at hamming 0 if
    dd4 didn't filter them; this pins the fix."""
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.operators.dedup import (
        dd4_simhash_dedup,
        simhash_pairs_of,
    )

    d = _corpus(spark)
    top = d.agg(F.max("doc_id")).collect()[0][0]
    nulls = spark.createDataFrame(
        [(top + 1 + i, None) for i in range(3)], "doc_id long, text string"
    )
    d = d.unionByName(nulls)
    want = sorted(map(tuple, simhash_pairs_of(d).collect()))
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(map(tuple, dd4_simhash_dedup(spark, str(tmp_path)).collect()))
    assert len(want) >= 10
    assert got == want
    release_pinned()
    spark.catalog.clearCache()


def test_triangle_quotient_matches_direct(spark):
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.operators.graph import triangle_counts_of

    d = _corpus(spark)
    tau = 0.5
    # direct: enumerate triangles on the FULL expanded pair graph
    e = _direct_pairs(d, tau).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("wa"), F.col("e1.b").alias("wb"), F.col("e2.b").alias("wc")
    )
    tri = wedges.join(
        e3, (F.col("e3.a") == F.col("wa")) & (F.col("e3.b") == F.col("wc"))
    ).select("wa", "wb", "wc")
    nodes = (
        tri.select(F.col("wa").alias("doc_id"))
        .unionAll(tri.select(F.col("wb").alias("doc_id")))
        .unionAll(tri.select(F.col("wc").alias("doc_id")))
    )
    want = sorted(
        map(
            tuple,
            nodes.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_triangles"))
            .collect(),
        )
    )
    got = sorted(map(tuple, triangle_counts_of(d, tau).collect()))
    assert len(want) >= 8  # triangles actually exist
    assert got == want
    release_pinned()
    spark.catalog.clearCache()
