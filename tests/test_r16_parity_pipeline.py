"""Adversarial-corpus parity for pack2_ffd_packing (rows-only:
sequential bin packing inside applyInPandas).

Branches the shipped corpus never hits, forced here:
- an OVER-BUDGET document (> PACK_BUDGET tokens): truncated to one
  exactly-full bin;
- an EXACT-FIT placement (headroom hits 0 — the bisect boundary);
- the TAIL-MERGE pass: shards leaving <= half-full bins that the
  per-language second pass must re-pack as atomic items;
- the EMPTY-TEXT doc: split('', ' ') = [''] counts ONE token;
- the MULTI-SHARD path (shard_cap=2): xxhash64 sharding plus
  per-shard BFD plus tail merge, held to the packing invariants.

Ground truth: an independent pure-Python best-fit-decreasing replica
(linear scan over open bins choosing min (headroom, bin_id), items in
(size desc, doc_id asc) order; tail merge in (fill desc, n_docs asc)
order) — compared EXACTLY per (lang, n_docs, fill) multiset on the
single-shard path, and by invariant on the sharded path (every fill
<= budget, totals conserved, at most ONE <= half-full bin per
language, bin count within the FFD guarantee)."""

from __future__ import annotations

import math

from tests.parity_util import docs_table, run_registered

BUDGET = 256  # pipeline.py contract, restated


def _bfd_ref(sizes):
    """Best-fit over sizes IN THE GIVEN ORDER: place in the open bin
    with the smallest sufficient headroom (ties -> lowest bin id)."""
    bins = []  # [fill, n_docs]
    for s in sizes:
        best = None
        for i, (fill, _) in enumerate(bins):
            room = BUDGET - fill
            if room >= s and (best is None or (room, i) < best[:2]):
                best = (room, i)
        if best is None:
            bins.append([s, 1])
        else:
            bins[best[1]][0] += s
            bins[best[1]][1] += 1
    return bins


def _pack_ref(doc_sizes):
    """Full single-shard replica: BFD in (size desc, doc_id asc)
    order, then the tail-merge pass over <= half-full bins in
    (fill desc, n_docs asc) order."""
    order = sorted(doc_sizes, key=lambda p: (-min(BUDGET, p[1]), p[0]))
    bins = _bfd_ref([min(BUDGET, s) for _, s in order])
    kept = [b for b in bins if b[0] * 2 > BUDGET]
    under = sorted((b for b in bins if b[0] * 2 <= BUDGET),
                   key=lambda b: (-b[0], b[1]))
    merged = []  # repack under-bins as atomic items
    for fill, nd in under:
        best = None
        for i, (mf, _) in enumerate(merged):
            room = BUDGET - mf
            if room >= fill and (best is None or (room, i) < best[:2]):
                best = (room, i)
        if best is None:
            merged.append([fill, nd])
        else:
            merged[best[1]][0] += fill
            merged[best[1]][1] += nd
    return sorted((nd, f) for f, nd in kept + merged)


def _n_tok(text):
    return len(text.split(" "))  # split keeps empties: '' -> 1 token


class TestPack2AdversarialParity:
    def test_single_shard_exact(self, spark, tmp_path):
        texts = {
            0: "w " * 499 + "w",            # 500 tokens -> capped 256
            1: "x " * 199 + "x",            # 200
            2: "y " * 55 + "y",             # 56: exact fit with 200
            3: "z " * 99 + "z",             # 100
            4: "q " * 99 + "q",             # 100
            5: "r " * 99 + "r",             # 100 -> a 100-fill tail bin
            6: "",                          # 1 token
            7: "s " * 29 + "s",             # 30
        }
        rows = [(i, t, "aa" if i < 5 else "bb") for i, t in texts.items()]
        got = run_registered(
            spark, tmp_path, "pack2_ffd_packing", {"documents": docs_table(rows)}
        )
        for lang in ("aa", "bb"):
            g = sorted(
                (int(r.n_docs), int(r.fill))
                for r in got[got.lang == lang].itertuples()
            )
            want = _pack_ref(
                [(i, _n_tok(t)) for i, t in texts.items()
                 if (lang == "aa") == (i < 5)]
            )
            assert g == want, (lang, g, want)
        # the over-budget doc really fills a bin alone
        aa = {(n, f) for n, f in
              ((int(r.n_docs), int(r.fill)) for r in got[got.lang == "aa"].itertuples())}
        assert (1, BUDGET) in aa or (2, BUDGET) in aa

    def test_sharded_invariants(self, spark, tmp_path):
        """shard_cap=2 forces many shards; every shard may leave one
        small bin, and the tail merge must leave at most ONE <=
        half-full bin per language while conserving totals."""
        from reduction_dask_spark.operators.pipeline import pack2_ffd_packing

        rows = []
        for i in range(30):
            n = 20 + (i * 13) % 90
            rows.append((i, "t " * (n - 1) + "t", "aa"))
        for t, df in {"documents": docs_table(rows)}.items():
            spark.createDataFrame(*df).coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / f"{t}.parquet")
            )
        got = pack2_ffd_packing(spark, str(tmp_path), shard_cap=2).toPandas()
        fills = got["fill"].astype(int).tolist()
        docs_per = got["n_docs"].astype(int).tolist()
        total = sum(min(BUDGET, _n_tok(t)) for _, t, _ in rows)
        assert all(f <= BUDGET for f in fills)
        assert sum(fills) == total                      # nothing lost
        assert sum(docs_per) == len(rows)               # every doc once
        assert sum(1 for f in fills if f * 2 <= BUDGET) <= 1
        assert len(fills) <= 2 * math.ceil(total / BUDGET)  # sane count
