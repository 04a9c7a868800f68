"""Hybrid retrieval: lexical (BM25) + vector (cosine) rank fusion.

The two retrieval stacks already exist separately — t6 is the Okapi
BM25 inverted-index path over `documents`, ss1 the exact cosine path
over `embeddings` (aligned ids: vec_id ≙ doc_id in the testdata).
Production training-data search uses BOTH and fuses them; the standard
score-free fusion is Reciprocal Rank Fusion (Cormack et al., SIGIR'09):

    rrf(d) = Σ_lists 1 / (K + rank_list(d)),  K = 60

Relational shape (per 100 TB scaling):
- lexical: postings (doc, tok, tf) shuffle once on tok; the query
  side (the query documents' distinct tokens) is small → broadcast;
  per-(query, doc) score is one partial-aggregated groupBy.
- vector: broadcast query vectors × one corpus scan (ss1's plan; swap
  in ss4/ss6 IVF/PQ for the approximate scale path — the fusion step
  is rank-based, so ANY ranker slots in unchanged).
- fusion: both top-L lists are |Q|·L rows — tiny at any corpus size —
  full-outer-joined on (qid, doc) and re-ranked. The fused relation
  never touches the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load_table
from .similarity import QUERY_MOD, as_double, dot
from .text import BM25_B, BM25_K1, tokens

RRF_K = 60       # RRF dampening constant (the paper's default)
RRF_L = 20       # depth of each input ranking
RRF_TOPK = 5     # fused results per query
RRF_NQ = 40      # fixed query-batch size: retrieval QPS doesn't grow
                 # with the corpus, so the demo query set is capped at
                 # the first RRF_NQ sampled ids (vec_id % QUERY_MOD
                 # alone would grow |Q| ∝ n and turn both rankers
                 # quadratic — the ×10 probe measured 34.7×)
MAXDF_FRAC = 0.1  # drop query terms appearing in >10% of documents:
                  # their idf ≈ ln(1.1) contributes ~nothing to the
                  # score but their postings dominate the join cost
                  # (the Lucene max-df / stopword-elision rule); the
                  # RELATIVE cap keeps semantics stable at any corpus
                  # size, unlike an absolute df cutoff


def _lex_ranked(d: DataFrame) -> DataFrame:
    """(qid, doc_id, lex_rank): top-L BM25 docs per query document.

    Query q's terms are the DISTINCT tokens of document q (doc_id %
    QUERY_MOD == 0, capped at the first RRF_NQ queries); score(q, d) =
    Σ_t idf(t)·bm25_tf(t, d), the full multi-term Okapi form of t6's
    single-term scorer, with max-df query-term pruning. Self-hits are
    excluded (a query doc trivially tops its own ranking)."""
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("dfreq"))
    stats = dl.agg(F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # query postings are ≤ RRF_NQ documents' tokens — broadcast THEM
    # into the (unbounded) dfreq relation for the max-df prune, never
    # the other way around
    qt_raw = tf.filter(
        (F.col("doc_id") % QUERY_MOD == 0) & (F.col("doc_id") < QUERY_MOD * RRF_NQ)
    ).select(F.col("doc_id").alias("qid"), "tok")
    qterms = (
        dfreq.join(F.broadcast(qt_raw), "tok")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("dfreq") <= MAXDF_FRAC * F.col("n_docs"))
        .select("qid", "tok")
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5))
    part = (
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(F.broadcast(dfreq.join(qterms.select("tok").distinct(), "tok")), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(part), 6).alias("bm25"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("lex_rank", F.row_number().over(w))
        .filter(F.col("lex_rank") <= RRF_L)
        .select("qid", "doc_id", "lex_rank")
    )


def _vec_ranked(emb: DataFrame) -> DataFrame:
    """(qid, doc_id, vec_rank): top-L cosine neighbors per query vector
    (ss1's broadcast-queries × one-scan plan, norms precomputed)."""
    q = emb.filter(
        (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < QUERY_MOD * RRF_NQ)
    ).select(
        F.col("vec_id").alias("qid"), as_double(F.col("embedding")).alias("qv")
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    c = emb.select(F.col("vec_id").alias("doc_id"), as_double(F.col("embedding")).alias("cv")).withColumn(
        "cn", F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("doc_id"))
        .select(
            "qid",
            "doc_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 5).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        scored.withColumn("vec_rank", F.row_number().over(w))
        .filter(F.col("vec_rank") <= RRF_L)
        .select("qid", "doc_id", "vec_rank")
    )


_RRF_SQL = f"""
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    dfreq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
    qt_raw AS (
        SELECT doc_id AS qid, tok FROM tf
        WHERE doc_id % {QUERY_MOD} = 0 AND doc_id < {QUERY_MOD * RRF_NQ}
    ),
    qterms AS (
        SELECT q.qid, q.tok
        FROM qt_raw q JOIN dfreq d USING (tok) CROSS JOIN stats s
        WHERE d.dfreq <= {MAXDF_FRAC} * s.n_docs
    ),
    lex_scored AS (
        SELECT q.qid, t.doc_id,
               round(sum(
                   ln(1.0 + (s.n_docs - d.dfreq + 0.5) / (d.dfreq + 0.5))
                   * (t.tf * ({BM25_K1} + 1.0))
                   / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl / s.avgdl))
               ), 6) AS bm25
        FROM tf t
        JOIN qterms q USING (tok)
        JOIN dfreq d USING (tok)
        JOIN dl l ON l.doc_id = t.doc_id
        CROSS JOIN stats s
        WHERE t.doc_id <> q.qid
        GROUP BY q.qid, t.doc_id
    ),
    lex_ranked AS (
        SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS lex_rank
        FROM lex_scored QUALIFY lex_rank <= {RRF_L}
    ),
    q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
          FROM embeddings
          WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_MOD * RRF_NQ}),
    c AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
          FROM embeddings),
    vec_scored AS (
        SELECT q.qid, c.doc_id,
               round(list_dot_product(q.qv, c.cv) / (q.qn * c.cn), 5) AS cos
        FROM q CROSS JOIN c WHERE q.qid <> c.doc_id
    ),
    vec_ranked AS (
        SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS vec_rank
        FROM vec_scored QUALIFY vec_rank <= {RRF_L}
    ),
    fused AS (
        SELECT coalesce(l.qid, v.qid) AS qid,
               coalesce(l.doc_id, v.doc_id) AS doc_id,
               round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                     + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf,
               l.lex_rank, v.vec_rank
        FROM lex_ranked l
        FULL OUTER JOIN vec_ranked v
          ON l.qid = v.qid AND l.doc_id = v.doc_id
    )
"""


@query(
    "rrf1_hybrid_retrieval",
    oracle=f"""
        WITH {_RRF_SQL}
        SELECT qid, doc_id, rrf,
               CAST(lex_rank AS INTEGER) AS lex_rank,
               CAST(vec_rank AS INTEGER) AS vec_rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rn
            FROM fused
        ) WHERE rn <= {RRF_TOPK}
    """,
    doc=f"rrf1 hybrid retrieval: fuse the lexical (multi-term Okapi "
        f"BM25, t6's index) and vector (exact cosine, ss1's scan) "
        f"top-{RRF_L} rankings per query with Reciprocal Rank Fusion "
        f"(Σ 1/({RRF_K}+rank)), emitting the fused top-{RRF_TOPK} with "
        "per-list provenance ranks. The fusion join touches only the "
        "|Q|×L rank lists — corpus-size-independent — so any ranker "
        "pair (BM25+IVF, BM25+PQ) slots in without replanning; this "
        "is the retrieval shape of a training-data search/dedup-"
        "inspection stack.",
    tags=("similarity", "text", "pipeline"),
)
def rrf1_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = _lex_ranked(load_table(spark, sf_dir, "documents"))
    vec = _vec_ranked(load_table(spark, sf_dir, "embeddings"))
    return fuse_rankings(lex, vec)


def fuse_rankings(
    lex: DataFrame,
    vec: DataFrame,
    k: int = RRF_K,
    topk: int = RRF_TOPK,
) -> DataFrame:
    """Reciprocal Rank Fusion of two (qid, doc_id, *_rank) rank lists —
    the production entry point (any ranker pair slots in; rrf1 is the
    BM25 × exact-cosine registration). Missing membership in one list
    contributes 0, the paper's convention."""
    fused = (
        lex.join(vec, ["qid", "doc_id"], "full_outer")
        .select(
            "qid",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (k + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (k + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )
