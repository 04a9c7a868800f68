"""P9: deterministic within-group column permutation.

The core primitive of MDA permutation importance
(/root/reference/feature_selection_numerai.py:127-130:
``np.random.shuffle(X_t[:, col])`` — permute one column independently
of the others). Spark has no row identity, so the idiomatic relational
form re-pairs two row_number sequences computed under different
orderings (SURVEY.md §4 "Anticipated custom pieces" #1):

    r_id   = row_number over (group, order by key)          -- stays put
    r_perm = row_number over (group, order by hash(seed,key)) -- shuffled
    join on (group, r_id = r_perm)  →  value moves to a new row

Determinism: the permutation is a pure function of (seed, key) — stable
under task retries and identical in DuckDB, unlike np.random.shuffle or
F.rand. Preserves the multiset per group by construction.

Scale: two window passes + one shuffle-join, all partitioned by the
group column; no driver involvement, works at any cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import ERA_EVENTS_SQL, PRED_EVENTS_SQL, md5i, md5i_sql
from ..registry import query
from ..sources import load_table


def permute_column(
    df: DataFrame, group: str, col: str, key: str, seed: int = 42
) -> DataFrame:
    """Return ``df`` with ``col`` permuted within each ``group``.

    All other columns keep their rows; only ``col`` moves.
    """
    others = [c for c in df.columns if c != col]
    w_id = Window.partitionBy(group).orderBy(key)
    salt = md5i(F.concat(F.lit(f"{seed}:"), F.col(key).cast("string")))
    w_perm = Window.partitionBy(group).orderBy(salt, F.col(key))
    keep = df.select(*others, F.row_number().over(w_id).alias("__r"))
    moved = df.select(
        F.col(group).alias("__g"), F.col(col), F.row_number().over(w_perm).alias("__r2")
    )
    out = keep.join(
        moved, (F.col(group) == F.col("__g")) & (F.col("__r") == F.col("__r2"))
    )
    return out.select(*df.columns)


@query(
    "p9_permute_column",
    oracle=f"""
        WITH base AS (
            SELECT {ERA_EVENTS_SQL} AS era, event_id, {PRED_EVENTS_SQL} AS pred
            FROM events
        ), keep AS (
            SELECT era, event_id,
                   row_number() OVER (PARTITION BY era ORDER BY event_id) AS r
            FROM base
        ), moved AS (
            SELECT era AS g, pred,
                   row_number() OVER (
                       PARTITION BY era
                       ORDER BY {md5i_sql("'42:' || CAST(event_id AS VARCHAR)")}, event_id
                   ) AS r2
            FROM base
        )
        SELECT k.era, k.event_id, m.pred
        FROM keep k JOIN moved m ON k.era = m.g AND k.r = m.r2
    """,
    doc="P9 within-era column permutation "
        "(feature_selection_numerai.py:127-130).",
    tags=("permutation",),
)
def p9_permute_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from ..functions import era_events, pred_events

    base = ev.select(era_events().alias("era"), "event_id", pred_events().alias("pred"))
    return permute_column(base, group="era", col="pred", key="event_id").select(
        "era", "event_id", "pred"
    )
