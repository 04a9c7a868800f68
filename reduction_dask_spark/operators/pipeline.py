"""End-to-end corpus-curation pipeline — the flagship LLM-data use
case composed from the operator library: quality filter → exact dedup
→ near-dup dedup → language selection, with a per-stage funnel summary.
Plus the CDC/upsert (MERGE-shaped) pattern emulated relationally.

The funnel is exactly what a 100 TB pre-training curation job reports;
every stage is a shuffle-on-key relational step (no driver loops), and
the whole funnel is oracle-checked end-to-end in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..sources import load_table
from .dedup import JACCARD_TAU, SHINGLE_SQL, _JACCARD_SQL, jaccard_pairs, shingle_table
from .text import normalized_fingerprint

QUALITY_TAU = 0.3
KEEP_LANGS = ("en", "de", "fr", "es")


def doc_survival_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document with a boolean column per curation stage.

    Single-pass design: the quality expression, the fingerprint
    groupBy, and the (expensive) Jaccard pair join each run exactly
    ONCE, and stages compose as flag conjunctions — vs the naive
    per-stage-subquery funnel that re-executes the whole upstream
    chain for every stage count (the Jaccard join twice, the quality
    scan four times). At 100 TB that difference is the job."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin("a", "the"))).cast("double") / n
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    quality = F.least(F.lit(1.0), n / F.lit(50.0)) * (1.0 - stop_ratio) * uniq_ratio

    staged = d.select(
        "doc_id", "lang",
        normalized_fingerprint(F.col("text")).alias("fp"),
        (quality >= QUALITY_TAU).alias("q_ok"),
    )

    # exact dedup: survivor = smallest doc_id per fingerprint among
    # quality survivors
    keep_exact = (
        staged.filter("q_ok")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.lit(True).alias("is_keeper"))
    )
    flagged = staged.join(keep_exact, ["fp", "doc_id"], "left").withColumn(
        "exact_ok", F.col("q_ok") & F.coalesce("is_keeper", F.lit(False))
    )

    # near-dup dedup: drop the higher-id member of each verified pair
    pairs = jaccard_pairs(shingle_table(spark, sf_dir).persist(), tau=JACCARD_TAU)
    drop = pairs.select(F.col("doc_b").alias("doc_id"), F.lit(True).alias("is_dup")).distinct()
    flagged = flagged.join(drop, "doc_id", "left").withColumn(
        "near_ok", F.col("exact_ok") & ~F.coalesce("is_dup", F.lit(False))
    )

    return flagged.select(
        "doc_id", "q_ok", "exact_ok", "near_ok",
        (F.col("near_ok") & F.col("lang").isin(*KEEP_LANGS)).alias("lang_ok"),
    )


def curated_docs(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Each curation stage as a DataFrame of surviving doc_ids."""
    flags = doc_survival_flags(spark, sf_dir)
    return {
        "total": flags.select("doc_id"),
        "quality": flags.filter("q_ok").select("doc_id"),
        "exact_dedup": flags.filter("exact_ok").select("doc_id"),
        "near_dedup": flags.filter("near_ok").select("doc_id"),
        "lang": flags.filter("lang_ok").select("doc_id"),
    }


_FUNNEL_SQL = f"""
    WITH {SHINGLE_SQL}, {_JACCARD_SQL},
    q AS (
        SELECT doc_id, lang, text FROM (
            SELECT doc_id, lang, text,
                   least(1.0, len(string_split(text, ' ')) / 50.0)
                   * (1.0 - len(list_filter(string_split(text, ' '), x -> x IN ('a', 'the')))::DOUBLE
                            / len(string_split(text, ' ')))
                   * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                      / len(string_split(text, ' '))) AS quality
            FROM documents
        ) WHERE quality >= {QUALITY_TAU}
    ),
    fp AS (
        SELECT doc_id, lang,
               md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
        FROM q
    ),
    exact AS (
        SELECT fp.doc_id, fp.lang
        FROM fp JOIN (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f) k
          ON fp.f = k.f AND fp.doc_id = k.doc_id
    ),
    neardup AS (
        SELECT e.doc_id, e.lang FROM exact e
        WHERE e.doc_id NOT IN (SELECT doc_b FROM jac WHERE jaccard >= {JACCARD_TAU})
    ),
    lang AS (
        SELECT doc_id FROM neardup WHERE lang IN {KEEP_LANGS!r}
    )
"""


@query(
    "pipe1_corpus_curation",
    oracle=_FUNNEL_SQL
    + """
    SELECT 'total' AS stage, CAST(count(*) AS BIGINT) AS n FROM documents
    UNION ALL SELECT 'quality', CAST(count(*) AS BIGINT) FROM q
    UNION ALL SELECT 'exact_dedup', CAST(count(*) AS BIGINT) FROM exact
    UNION ALL SELECT 'near_dedup', CAST(count(*) AS BIGINT) FROM neardup
    UNION ALL SELECT 'lang', CAST(count(*) AS BIGINT) FROM lang
    """,
    doc="pipe1 curation funnel: quality ≥ τ → exact dedup (min-id per "
        "fingerprint) → near-dup dedup (drop higher-id of each "
        "verified Jaccard pair) → language allowlist; returns the "
        "per-stage survivor counts. The composed 100 TB curation job, "
        "oracle-checked end-to-end.",
    tags=("pipeline", "dedup", "text", "bench"),
)
def pipe1_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = doc_survival_flags(spark, sf_dir)
    counts = flags.agg(
        F.count("*").alias("total"),
        F.sum(F.col("q_ok").cast("long")).alias("quality"),
        F.sum(F.col("exact_ok").cast("long")).alias("exact_dedup"),
        F.sum(F.col("near_ok").cast("long")).alias("near_dedup"),
        F.sum(F.col("lang_ok").cast("long")).alias("lang"),
    )
    # unpivot the 1-row aggregate to the (stage, n) funnel shape
    stages = ("total", "quality", "exact_dedup", "near_dedup", "lang")
    return counts.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(s).alias("stage"), F.col(s).alias("n")) for s in stages
            ])
        ).alias("r")
    ).select("r.stage", "r.n")


@query(
    "scd1_merge_upsert",
    oracle="""
        WITH updates AS (
            SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
            FROM customer WHERE c_custkey % 7 = 0
        ),
        merged AS (
            SELECT c_custkey, c_name, c_acctbal FROM updates
            UNION ALL
            SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
        )
        SELECT c_custkey, c_name, c_acctbal FROM merged
    """,
    doc="scd1 MERGE/upsert emulation (no Delta in this image): updates "
        "∪ (base ANTI-JOIN updates) — the CDC pattern from the public "
        "Spark playbook; at scale the anti-join broadcasts the (small) "
        "delta against the bucketed base.",
    tags=("pipeline", "join"),
)
def scd1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
    )
    untouched = c.join(F.broadcast(updates.select("c_custkey")), "c_custkey", "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    return updates.unionByName(untouched)
