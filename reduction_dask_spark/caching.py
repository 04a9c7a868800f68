"""Scoped cache pinning — bounded lifecycle for operator persist()s.

Several operators MUST materialize an intermediate exactly once and
have every consumer branch read that one materialization:

- global_rank / global_prefix_agg pin the pid-stamped range exchange
  (the pid-consistency contract — see operators/relational.py);
- the dedup/graph family pins the shingle index and its exact-dup-
  representative slice, which feed both candidate generation and the
  verify/expand stages.

Those relations feed the LAZY result DataFrame the operator returns,
so the operator itself cannot unpersist them (a cache-miss recompute
after unpersist would re-sample range boundaries and break the
pid contract, or re-run the shingle explode per branch). The cache is
therefore CALLER-owned, with this module as the one lifecycle seam:

- operators register long-lived persists through :func:`pin`;
- batch runners (tools/sweep.py, tools/compare.py, bench.py) already
  clearCache() between queries, which drops pinned SQL caches too;
- in-session API users call :func:`release_pinned` after materializing
  a query's result to return executor storage to baseline without
  touching unrelated caches or localCheckpoint storage (which must
  never be unpersisted — checkpoint lineage is truncated and cannot
  recompute).

Iterative operators whose intermediates are fully materialized before
return (min_label_components' edge relation) unpersist directly at
exit instead and never appear here.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []
_LOCK = threading.Lock()


def pin(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for release_pinned()."""
    df.persist()
    with _LOCK:
        _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every pinned relation; returns how many were
    released. Safe to call at any query boundary: results already
    materialized stay valid, and re-running an operator simply
    re-pins (and re-materializes) its relations. Batch runners call
    this alongside spark.catalog.clearCache() between queries so the
    registry (and the JVM logical plans it references) stays bounded
    across a multi-hundred-query sweep."""
    with _LOCK:
        drained = list(_PINNED)
        _PINNED.clear()
    for df in drained:
        df.unpersist()
    return len(drained)


def pinned_count() -> int:
    with _LOCK:
        return len(_PINNED)
