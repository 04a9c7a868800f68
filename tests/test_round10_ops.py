"""Ground truths for the round-10 additions: the pipe3 span-excision
funnel (planted benchmark quote inside a long near-survivor host),
the pipe4/pipe4b classifier-gated funnel (fail-closed gate semantics,
heuristic-vs-classifier disagreement, trained-gate monotonicity), and
dd13's two-tier ingestion dedup (tier-disagreement fixtures in both
directions)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from .conftest import SF_SMALL


# ---------------------------------------------------------------- pipe3


def test_pipe3_planted_quote_is_excised(spark):
    """A benchmark passage quoted at an UNALIGNED offset inside a long
    near-surviving host must be cut out exactly (interval [23, 43));
    a clean survivor appears UNTOUCHED in the manifest (n_removed=0,
    hash of its full token stream); hosts outside the near-survivor
    set emit no row."""
    from reduction_dask_spark.operators.dedup import BENCH_MOD
    from reduction_dask_spark.operators.pipeline import span_excision_of

    quote = [f"q{i}" for i in range(20)]
    host1 = [f"a{i}" for i in range(23)] + quote + [f"b{i}" for i in range(7)]
    host2 = [f"c{i}" for i in range(30)]          # clean near survivor
    host3 = [f"d{i}" for i in range(10)] + quote  # contaminated, NOT a survivor
    docs = spark.createDataFrame(
        [
            (BENCH_MOD, " ".join(quote)),
            (1, " ".join(host1)),
            (2, " ".join(host2)),
            (3, " ".join(host3)),
        ],
        "doc_id long, text string",
    )
    near = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = {r["doc_id"]: r for r in span_excision_of(docs, near).collect()}

    assert set(rows) == {1, 2}
    r = rows[1]
    assert r["n_tokens"] == 50
    assert r["n_removed"] == 20
    cleaned = " ".join(t for i, t in enumerate(host1) if not (23 <= i < 43))
    assert r["clean_fp"] == hashlib.md5(cleaned.encode()).hexdigest()
    # untouched survivor: manifest row with n_removed=0, full-text hash
    r2 = rows[2]
    assert r2["n_removed"] == 0 and r2["n_tokens"] == 30
    assert r2["clean_fp"] == hashlib.md5(" ".join(host2).encode()).hexdigest()


def test_pipe3_overlapping_spans_merge(spark):
    """Two benchmark docs hitting OVERLAPPING regions of one host must
    merge to a single island (no double-counted n_removed)."""
    from reduction_dask_spark.operators.dedup import BENCH_MOD
    from reduction_dask_spark.operators.pipeline import span_excision_of

    quote = [f"q{i}" for i in range(24)]
    host = [f"a{i}" for i in range(10)] + quote + [f"b{i}" for i in range(6)]
    docs = spark.createDataFrame(
        [
            (BENCH_MOD, " ".join(quote[:15])),       # covers host [10, 25)
            (2 * BENCH_MOD, " ".join(quote[9:])),    # covers host [19, 34)
            (1, " ".join(host)),
        ],
        "doc_id long, text string",
    )
    near = spark.createDataFrame([(1,)], "doc_id long")
    r = span_excision_of(docs, near).collect()
    assert len(r) == 1  # the manifest covers exactly the near set
    assert r[0]["n_removed"] == 24  # one merged island [10, 34)
    cleaned = " ".join(t for i, t in enumerate(host) if not (10 <= i < 34))
    assert r[0]["clean_fp"] == hashlib.md5(cleaned.encode()).hexdigest()


# ---------------------------------------------------------------- pipe4


def test_pipe4_gate_fails_closed(spark):
    """Docs absent from the quality_gate relation must fail the first
    stage (and therefore every later stage) — never pass by default."""
    from reduction_dask_spark.operators.pipeline import doc_survival_flags
    from reduction_dask_spark.sources import load_table

    gate = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 2 == 0)
        .withColumn("cls_ok", F.lit(True))
    )
    flags = doc_survival_flags(spark, SF_SMALL, quality_gate=gate).toPandas()
    odd = flags[flags.doc_id % 2 == 1]
    even = flags[flags.doc_id % 2 == 0]
    assert len(odd) and len(even)
    assert not odd.q_ok.any()        # absent ⇒ fail closed
    assert even.q_ok.all()           # present-and-true ⇒ pass
    # downstream stages still narrow monotonically
    chain = ["q_ok", "gopher_ok", "rep_ok", "exact_ok", "near_ok",
             "decontam_ok", "lang_ok"]
    for a, b in zip(chain, chain[1:]):
        assert not (flags[b] & ~flags[a]).any(), (a, b)


def test_pipe4_heuristic_and_classifier_gates_disagree(spark):
    """The registered pipe4 gate (cls1) and pipe1's heuristic quality
    score are genuinely different filters: some documents get opposite
    first-stage verdicts, and the funnels downstream differ."""
    from reduction_dask_spark.operators.pipeline import (
        _cls1_gate,
        doc_survival_flags,
    )

    heur = doc_survival_flags(spark, SF_SMALL).select("doc_id", "q_ok").toPandas()
    gated = (
        doc_survival_flags(spark, SF_SMALL, quality_gate=_cls1_gate(spark, SF_SMALL))
        .select("doc_id", "q_ok")
        .toPandas()
    )
    m = heur.merge(gated, on="doc_id", suffixes=("_h", "_c"))
    assert len(m) == len(heur)
    assert (m.q_ok_h != m.q_ok_c).any()
    # and in BOTH directions — neither gate subsumes the other here
    assert (m.q_ok_h & ~m.q_ok_c).any()
    assert (~m.q_ok_h & m.q_ok_c).any()


def test_pipe4b_trained_gate_funnel_shape(spark):
    """The trained-classifier (cls2 IRLS) gate rides the identical
    funnel path: 8 stages, counts non-increasing, total preserved."""
    from reduction_dask_spark.operators.pipeline import pipe4b_trained_gated_funnel

    rows = {r["stage"]: r["n"] for r in
            pipe4b_trained_gated_funnel(spark, SF_SMALL).collect()}
    order = ["total", "gate", "gopher", "repetition", "exact_dedup",
             "near_dedup", "decontam", "lang"]
    assert set(rows) == set(order)
    ns = [rows[s] for s in order]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert ns[0] > ns[1] > 0  # the gate actually gates


# ---------------------------------------------------------------- pipe5


def test_pipe5_matches_pipe2_minus_excised(spark):
    """pipe5 exports the SAME keep set through the SAME shuffle key as
    pipe2 — per shard the doc counts must match exactly and the token
    mass can only shrink (excision removes, never adds)."""
    from reduction_dask_spark.operators.pipeline import (
        pipe2_export_manifest,
        pipe5_clean_export,
    )

    p2 = {r["shard"]: r for r in pipe2_export_manifest(spark, SF_SMALL).collect()}
    p5 = {r["shard"]: r for r in pipe5_clean_export(spark, SF_SMALL).collect()}
    assert set(p2) == set(p5) and len(p2) > 0
    for s in p2:
        assert p5[s]["n_docs"] == p2[s]["n_docs"]
        assert p5[s]["n_tokens"] <= p2[s]["n_tokens"]


# ---------------------------------------------------------------- dd13


def test_dd13_tier_disagreement_fixture(spark):
    """Tiers must disagree in BOTH directions: a same-lead-in delta is
    rejected at ingest even though its full text is new (tier 2's
    exact pass would admit it), while a changed-lead-in near-dup or a
    whitespace-variant exact dup sails through tier 1 and is caught
    only by tier 2."""
    from reduction_dask_spark.operators.dedup import (
        DELTA_MOD,
        DELTA_REM,
        two_tier_dedup_of,
    )

    assert (DELTA_MOD, DELTA_REM) == (5, 3)  # ids below assume the split
    h1 = [f"h{i}" for i in range(12)]
    w = [f"w{i}" for i in range(20)]
    e = [f"e{i}" for i in range(12)]
    docs = [
        (1, " ".join(h1)),                             # history
        (2, " ".join(w)),                              # history
        (4, " ".join(e)),                              # history
        # delta (id % 5 == 3):
        (3, " ".join(h1[:8] + ["a9", "a10", "a11"])),  # same lead-in, new body
        (8, " ".join(["x1"] + w[1:])),                 # new lead-in, near-dup body
        (13, " ".join(f"c{i}" for i in range(10))),    # genuinely fresh
        (18, " ".join(f"t{i}" for i in range(12))),    # twin keeper
        (23, " ".join(f"t{i}" for i in range(12))),    # twin dup
        (28, e[0] + "  " + " ".join(e[1:])),           # double space: new prefix,
                                                       # same NORMALIZED fp as id 4
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in two_tier_dedup_of(d).collect()}
    assert set(got) == {3, 8, 13, 18, 23, 28}

    def flags(i):
        r = got[i]
        return (r["ingest_hist"], r["ingest_intra"], r["exact_hist"],
                r["intra_dup"], r["near_hist"], r["accepted"])

    # tier-1 reject tier 2 would have admitted: tier-2 flags stay false
    assert flags(3) == (True, False, False, False, False, False)
    # tier-1 pass, tier-2 near-dup catch
    assert flags(8) == (False, False, False, False, True, False)
    assert flags(13) == (False, False, False, False, False, True)
    # intra-batch twins: min-id survives, higher id rejected at ingest
    assert flags(18) == (False, False, False, False, False, True)
    assert flags(23) == (False, True, False, False, False, False)
    # whitespace variant: prefix key misses it, normalized fp catches it
    r28 = got[28]
    assert not r28["ingest_hist"] and r28["exact_hist"] and not r28["accepted"]
