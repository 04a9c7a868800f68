"""Seeded differential fuzz (r10): the new shared kernels re-derived
in plain python on randomized inputs — 200 random interval layouts
through the gaps-and-islands excision (overlaps, nesting, adjacency,
duplicates) and a 120-doc collision-heavy corpus through dd13's
two-tier flags. Deterministic seeds, one Spark job per mode."""

from __future__ import annotations

import hashlib
import random
import re

from .conftest import SF_SMALL  # noqa: F401  (fixture wiring)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_excise_intervals_matches_python_reference(spark):
    """Merged-island n_removed and the positional token cut must equal
    a set-based python recomputation for arbitrary overlapping /
    nested / adjacent / duplicated interval layouts, in BOTH the
    affected-only and full-manifest modes."""
    from reduction_dask_spark.operators.dedup import excise_intervals

    rng = random.Random(20260815)
    docs, iv_rows = [], set()
    expected = {}
    for did in range(1, 201):
        n = rng.randint(1, 40)
        toks = [f"d{did}t{i}" for i in range(n)]
        docs.append((did, " ".join(toks)))
        cover: set[int] = set()
        for _ in range(rng.randint(0, 6)):
            s = rng.randint(0, n - 1)
            e = rng.randint(s + 1, n)
            iv_rows.add((did, s, e))
            cover.update(range(s, e))
        kept = " ".join(t for i, t in enumerate(toks) if i not in cover)
        expected[did] = (n, len(cover), _md5(kept))

    d = spark.createDataFrame(docs, "doc_id long, text string")
    iv = spark.createDataFrame(sorted(iv_rows), "doc_id long, s long, e long")

    affected = {r["doc_id"]: r for r in excise_intervals(d, iv).collect()}
    assert set(affected) == {did for did, _, _ in iv_rows}
    manifest = {r["doc_id"]: r for r in
                excise_intervals(d, iv, affected_only=False).collect()}
    assert set(manifest) == set(expected)

    for did, (n, nrem, fp) in expected.items():
        r = manifest[did]
        assert (r["n_tokens"], r["n_removed"], r["clean_fp"]) == (n, nrem, fp), did
        if did in affected:
            a = affected[did]
            assert (a["n_tokens"], a["n_removed"], a["clean_fp"]) == (n, nrem, fp)


def test_dd13_matches_python_reference(spark):
    """dd13's two-tier flags re-derived in python (prefix keys, history
    sets, df-capped shingle Jaccard restricted to tier-1 survivors) on
    a collision-heavy random corpus."""
    from reduction_dask_spark.operators.dedup import (
        DELTA_MOD,
        DELTA_REM,
        DF_CAP,
        JACCARD_TAU,
        K_SHINGLE,
        PREFIX_K,
        two_tier_dedup_of,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(did, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
            for did in range(1, 121)]
    # plant guaranteed tier-2 work on top of the random mass (delta ids
    # ≡ DELTA_REM mod DELTA_MOD; history ids ≢): a 30-token history
    # donor with a last-token near-edit in the delta (28 vs 28 shingles,
    # 25 shared → J ≈ 0.81 ≥ τ), a double-space whitespace variant
    # (prefix key diverges, normalized fingerprint matches — tier 2's
    # exact catch), a shared-prefix/new-body doc (tier-1 reject), and
    # an intra-delta twin pair
    long = " ".join(f"p{i}" for i in range(30))
    twin = " ".join(f"q{i}" for i in range(12))
    donors = [t for i, t in docs if i % DELTA_MOD != DELTA_REM and len(t.split()) >= 10]
    planted = {
        124: long,                                                   # history donor
        128: " ".join(["pX"] + long.split(" ")[1:]),                 # FIRST-token near-edit
                                                                     # (prefix diverges → reaches tier 2)
        133: " ".join(donors[0].split(" ")[:8] + ["qq", "rr"]),      # prefix clash → tier-1 reject
        138: twin,                                                   # twin source...
        143: twin,                                                   # ...intra pair
        148: long.replace("p0 ", "p0  ", 1),                         # whitespace variant
                                                                     # (prefix diverges, nfp matches)
    }
    docs += sorted(planted.items())
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in two_tier_dedup_of(d).collect()}

    # ---- python reference ----
    def toks(t):
        return t.strip().split(" ")

    def pfp(t):
        return _md5(" ".join(toks(t)[:PREFIX_K]).lower())

    def nfp(t):
        return _md5(re.sub(r"\s+", " ", t.strip()).lower())

    def shingles(t):
        tk = t.split(" ")  # the shingle index does NOT trim (SHINGLE_SQL)
        return {" ".join(tk[i:i + K_SHINGLE]) for i in range(len(tk) - K_SHINGLE + 1)} \
            if len(tk) >= K_SHINGLE else set()

    is_delta = lambda i: i % DELTA_MOD == DELTA_REM
    hist = [(i, t) for i, t in docs if not is_delta(i)]
    delta = [(i, t) for i, t in docs if is_delta(i)]
    hist_pfp = {pfp(t) for _, t in hist}
    hist_nfp = {nfp(t) for _, t in hist}

    # df-cap over the FULL corpus (per-doc-distinct shingle rows)
    df: dict[str, int] = {}
    for _, t in docs:
        for g in shingles(t):
            df[g] = df.get(g, 0) + 1
    capped = {i: {g for g in shingles(t) if df[g] <= DF_CAP} for i, t in docs}

    t1 = {}
    min_pfp: dict[str, int] = {}
    for i, t in delta:
        min_pfp[pfp(t)] = min(min_pfp.get(pfp(t), i), i)
    for i, t in delta:
        t1[i] = (pfp(t) in hist_pfp, i != min_pfp[pfp(t)])
    surv1 = [i for i, _ in delta if not t1[i][0] and not t1[i][1]]

    min_nfp: dict[str, int] = {}
    dtext = dict(docs)
    for i in surv1:
        k = nfp(dtext[i])
        min_nfp[k] = min(min_nfp.get(k, i), i)
    for i in sorted(set(got)):
        ih, ii = t1[i]
        eh = idup = nh = False
        if i in surv1:
            eh = nfp(dtext[i]) in hist_nfp
            idup = i != min_nfp[nfp(dtext[i])]
            a = capped[i]
            for h, _ in hist:
                b = capped[h]
                inter = len(a & b)
                if inter and round(inter / (len(a) + len(b) - inter), 6) >= JACCARD_TAU:
                    nh = True
                    break
        r = got[i]
        assert (r["ingest_hist"], r["ingest_intra"], r["exact_hist"],
                r["intra_dup"], r["near_hist"], r["accepted"]) == (
            ih, ii, eh, idup, nh,
            not (ih or ii or eh or idup or nh)), i

    assert set(got) == {i for i, _ in delta}
    # the planted cases must fire the flags they were built for
    assert got[128]["near_hist"] and not got[128]["accepted"]
    assert got[133]["ingest_hist"] and not got[133]["accepted"]
    assert got[143]["ingest_intra"] and got[138]["accepted"]
    assert got[148]["exact_hist"] and not got[148]["ingest_hist"]
