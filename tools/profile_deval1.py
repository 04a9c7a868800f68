"""deval1 build-vs-execute profile (r13 verdict item 3).

Times each component of deval1_dedup_quality separately at a replica
scale, forcing each intermediate with the noop sink, so the sweep-tail
reading (20.4 s ×10 at r13) is attributable: exact-group build, rep
shingle restriction, exact-Jaccard truth, each approximate method's
candidate pairs, and the final weighted P/R/F1 assembly.

Usage: python tools/profile_deval1.py [/tmp/rds_scale_x10]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rds_scale_x10"

    from pyspark.sql import functions as F

    from reduction_dask_spark.caching import pin, release_pinned
    from reduction_dask_spark.operators.dedup import (
        JACCARD_TAU,
        exact_groups,
        jaccard_pairs,
        minhash_lsh_pairs_of,
        prefix_filter_pairs_of,
        shingle_table_of,
        simhash_pairs_of,
    )
    from reduction_dask_spark.operators.dedup import deval1_dedup_quality
    from reduction_dask_spark.session import get_spark
    from reduction_dask_spark.sources import load_table

    spark = get_spark("profile_deval1")
    # warm-up generic machinery
    load_table(spark, sf_dir, "documents").limit(10).collect()

    def t(label, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{label:28s} {dt:7.2f}s", flush=True)
        return dt

    total0 = time.perf_counter()
    d = load_table(spark, sf_dir, "documents")
    # pre-r14 path, timed for attribution: full-corpus index + restrict
    sh_full = pin(shingle_table_of(d))
    t("OLD shingle_table(full)", sh_full)
    _, grp = exact_groups(d)
    grp = pin(grp)
    t("exact_groups", grp)
    reps = grp.select(F.col("rep_id").alias("doc_id"))
    old_rep_sh = sh_full.join(reps, "doc_id", "left_semi")
    t("OLD rep restrict", old_rep_sh)
    release_pinned()
    spark.catalog.clearCache()
    # r14 path: weighted-df rep quotient (what deval1 now runs).
    # Timer and `reps` restart here so the sum-of-parts row measures
    # ONLY the new path (the old-path rows above are for attribution).
    from reduction_dask_spark.operators.dedup import rep_capped_shingles

    total0 = time.perf_counter()
    _, grp = exact_groups(d)
    grp = pin(grp)
    reps = grp.select(F.col("rep_id").alias("doc_id"))
    rep_sh = pin(rep_capped_shingles(d, grp))
    t("NEW rep_capped_shingles", rep_sh)
    rep_d = d.join(reps, "doc_id", "left_semi")
    truth = pin(jaccard_pairs(rep_sh, tau=JACCARD_TAU).select("doc_a", "doc_b"))
    t("truth=jaccard_pairs(reps)", truth)
    t("minhash_lsh_pairs(reps)", minhash_lsh_pairs_of(rep_sh).select("doc_a", "doc_b"))
    t("simhash_pairs(reps)", simhash_pairs_of(rep_d).select("doc_a", "doc_b"))
    t("prefix_filter_pairs(reps)", prefix_filter_pairs_of(rep_sh).select("doc_a", "doc_b"))
    print(f"{'sum-of-parts (pins reused)':28s} {time.perf_counter()-total0:7.2f}s")
    release_pinned()
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    deval1_dedup_quality(spark, sf_dir).write.mode("overwrite").format("noop").save()
    print(f"{'deval1 end-to-end':28s} {time.perf_counter()-t0:7.2f}s")
    release_pinned()
    spark.stop()


if __name__ == "__main__":
    main()
