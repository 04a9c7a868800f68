"""Stage-level wall-clock profile of the curation funnel (pipe1/3/5).

Times each materialization point of _flags_through_near and the pipe3
span/excision tail separately (guide §1: find where the time goes
before changing anything). Run on an idle box; prints one line per
stage. Not part of any contract — a measurement tool for r16.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from reduction_dask_spark.session import get_spark
    from reduction_dask_spark.caching import release_pinned
    import reduction_dask_spark.operators.pipeline as P
    from reduction_dask_spark.registry import load_all_operators

    load_all_operators()
    spark = get_spark("profile_funnel")
    # warm-up (same as bench)
    from reduction_dask_spark.operators.metrics import m1_spearman_by_era

    m1_spearman_by_era(spark, SF_DIR).collect()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    for rep in range(3):
        t_all0 = time.perf_counter()
        ts = {}

        t0 = time.perf_counter()
        d, flagged, sh_surv = P._flags_through_near(spark, SF_DIR)
        ts["A_flags_through_near (3 barriers run eagerly)"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        near_ids = flagged.filter("near_ok").select("doc_id")
        manifest = P.span_excision_of(d, near_ids)
        ts["B_span_excision_build (near_ids barrier runs)"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(manifest)
        ts["C_manifest_noop (span pass + excise execute)"] = time.perf_counter() - t0

        ts["TOTAL pipe3-equivalent"] = time.perf_counter() - t_all0
        for k, v in ts.items():
            print(f"rep{rep} {k:50s} {v:6.3f}s", flush=True)
        release_pinned()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # finer split of stage A
    for rep in range(2):
        from reduction_dask_spark.caching import barrier
        from reduction_dask_spark.sources import load_table
        from reduction_dask_spark.operators.text import (
            GQ_ALPHA_DEN, GQ_ALPHA_NUM, GQ_MAX_WORDS, GQ_MIN_STOPS,
            GQ_MIN_WORDS, GQ_MWL_HI, GQ_MWL_LO, STOPWORDS,
            normalized_fingerprint, repetition_flags_of,
        )
        from pyspark.sql.window import Window

        t0 = time.perf_counter()
        d = load_table(spark, SF_DIR, "documents")
        toks = F.split(F.col("text"), " ")
        n = F.size(toks)
        sum_len = F.aggregate(
            F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )
        n_stop = F.size(
            F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS]))
        )
        n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
        gq_pass = (
            n.between(GQ_MIN_WORDS, GQ_MAX_WORDS)
            & (sum_len >= GQ_MWL_LO * n)
            & (sum_len <= GQ_MWL_HI * n)
            & (n_stop >= GQ_MIN_STOPS)
            & (GQ_ALPHA_DEN * n_alpha >= GQ_ALPHA_NUM * n)
        )
        stop_ratio = (
            F.size(F.filter(toks, lambda x: x.isin("a", "the"))).cast("double") / n
        )
        uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
        quality = F.least(F.lit(1.0), n / F.lit(50.0)) * (1.0 - stop_ratio) * uniq_ratio
        q_ok = quality >= P.QUALITY_TAU
        staged = barrier(
            d.select(
                "doc_id", "lang",
                normalized_fingerprint(F.col("text")).alias("fp"),
                q_ok.alias("q_ok"),
                (q_ok & gq_pass).alias("gopher_ok"),
            )
        )
        print(f"rep{rep} A1_staged_barrier {time.perf_counter()-t0:6.3f}s", flush=True)

        t0 = time.perf_counter()
        rep_src = d.join(
            staged.filter("gopher_ok").select("doc_id"), "doc_id", "left_semi"
        ).select("doc_id", "text")
        rep_pass = repetition_flags_of(rep_src).select(
            "doc_id",
            ((F.col("f_top2") + F.col("f_top3") + F.col("f_dup5")) == 0).alias("_rep_pass"),
        )
        flagged = staged.join(rep_pass, "doc_id", "left").withColumn(
            "rep_ok", F.col("gopher_ok") & F.coalesce("_rep_pass", F.lit(False))
        )
        flagged = flagged.withColumn(
            "exact_ok",
            F.col("rep_ok")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("rep_ok"), F.col("doc_id"))).over(
                    Window.partitionBy("fp")
                )
            ),
        )
        flagged = barrier(
            flagged.select("doc_id", "lang", "q_ok", "gopher_ok", "rep_ok", "exact_ok")
        )
        print(f"rep{rep} A2_rep+exact_barrier {time.perf_counter()-t0:6.3f}s", flush=True)

        t0 = time.perf_counter()
        from reduction_dask_spark.operators.dedup import (
            JACCARD_TAU, jaccard_pairs, shingle_table_of,
        )
        surv = d.join(flagged.filter("exact_ok").select("doc_id"), "doc_id").select(
            "doc_id", "text"
        )
        sh_surv = barrier(shingle_table_of(surv))
        print(f"rep{rep} A3_shingle_barrier {time.perf_counter()-t0:6.3f}s", flush=True)

        t0 = time.perf_counter()
        pairs = jaccard_pairs(sh_surv, tau=JACCARD_TAU)
        drop = pairs.select(F.col("doc_b").alias("doc_id"), F.lit(True).alias("is_dup")).distinct()
        out = flagged.join(drop, "doc_id", "left").select(
            "doc_id", "lang", "q_ok", "gopher_ok", "rep_ok", "exact_ok",
            (F.col("exact_ok") & ~F.coalesce("is_dup", F.lit(False))).alias("near_ok"),
        )
        noop(out)
        print(f"rep{rep} A4_pairs+near_noop {time.perf_counter()-t0:6.3f}s", flush=True)
        release_pinned()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    spark.stop()


if __name__ == "__main__":
    main()
