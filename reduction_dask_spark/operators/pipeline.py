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


def curated_docs(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Each curation stage as a DataFrame of surviving doc_ids."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin("a", "the"))).cast("double") / n
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    quality = F.least(F.lit(1.0), n / F.lit(50.0)) * (1.0 - stop_ratio) * uniq_ratio

    staged = d.select("doc_id", "lang", "text", quality.alias("quality"))
    q = staged.filter(F.col("quality") >= QUALITY_TAU)

    # exact dedup: keep the smallest doc_id per normalized fingerprint
    fp = q.select("doc_id", "lang", normalized_fingerprint(F.col("text")).alias("fp"))
    keep_exact = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact = fp.join(keep_exact, ["fp", "doc_id"]).select("doc_id", "lang")

    # near-dup dedup: drop the higher-id member of each verified pair
    pairs = jaccard_pairs(shingle_table(spark, sf_dir).persist(), tau=JACCARD_TAU)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    neardup = exact.join(drop, "doc_id", "left_anti")

    lang = neardup.filter(F.col("lang").isin(*KEEP_LANGS))
    return {
        "total": d.select("doc_id"),
        "quality": q.select("doc_id"),
        "exact_dedup": exact.select("doc_id"),
        "near_dedup": neardup.select("doc_id"),
        "lang": lang.select("doc_id"),
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
    stages = curated_docs(spark, sf_dir)
    parts = [
        df.agg(F.count("*").alias("n")).select(F.lit(name).alias("stage"), "n")
        for name, df in stages.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
