"""Adversarial-corpus parity for dd3b_minhash_lsh_ml (rows-only:
MLlib's MinHash seeds aren't portable to SQL).

What IS deterministic and engine-independent in dd3b — the exact-dup
quotient bookkeeping around the LSH — is exactly what the shipped
corpus never stresses:

- a 4-copy exact-duplicate content: ONE within-group self row
  (doc_a == doc_b == rep) with jaccard_est 1.0 and n_pairs
  m(m-1)/2 = 6 — never 4 rows, never cross rows;
- a near-dup pair where BOTH contents are duplicated (m_a=2, m_b=3):
  the weighted cross row must carry n_pairs = m_a*m_b = 6 between the
  two MIN-doc_id representatives;
- a SHORT duplicated content (< K_SHINGLE tokens, m=3): no shingles,
  so it must appear NOWHERE — the self-row left_semi guard against
  shingle-less reps is the branch under test;
- jaccard_est equals the true shingle-set Jaccard (HashingTF at 2^18
  features is collision-free for this corpus, and
  approxSimilarityJoin's distCol is the exact distance on the hashed
  sets — the approximation is candidate RECALL, which is seeded
  (seed=42) and hence deterministic here).

Ground truth: shingle sets + Jaccard + quotient arithmetic recomputed
in pure Python."""

from __future__ import annotations

from tests.parity_util import docs_table, run_registered

K_SHINGLE, TAU = 3, 0.7  # dedup.py contract, restated


def _shingles(text: str) -> frozenset:
    toks = [t for t in text.split(" ")]
    return frozenset(
        tuple(toks[i : i + K_SHINGLE]) for i in range(len(toks) - K_SHINGLE + 1)
    )


class TestDd3bAdversarialParity:
    def test_quotient_bookkeeping(self, spark, tmp_path):
        base = " ".join(f"tok{i}" for i in range(20))
        near = " ".join(f"tok{i}" for i in range(19)) + " changed"
        ja = len(_shingles(base) & _shingles(near)) / len(
            _shingles(base) | _shingles(near)
        )
        assert ja >= TAU  # the pair must clear the LSH threshold
        rows = [
            # content A x2 (reps at min doc_id 0), content B x3 (rep 10)
            (0, base, "en"), (1, base, "en"),
            (10, near, "en"), (11, near, "en"), (12, near, "en"),
            # 4-copy exact group, unrelated text (rep 20, m=4)
            (20, "quite another story told in many entirely new words here", "en"),
            (21, "quite another story told in many entirely new words here", "en"),
            (22, "quite another story told in many entirely new words here", "en"),
            (23, "quite another story told in many entirely new words here", "en"),
            # short content x3: two tokens < K_SHINGLE, must vanish
            (30, "tiny doc", "en"), (31, "tiny doc", "en"), (32, "tiny doc", "en"),
            # singleton bystander
            (40, "completely disjoint vocabulary sentence with zero overlap anywhere", "en"),
        ]
        got = run_registered(
            spark, tmp_path, "dd3b_minhash_lsh_ml", {"documents": docs_table(rows)}
        )
        by_pair = {
            (int(r.doc_a), int(r.doc_b)): (r.jaccard_est, int(r.n_pairs))
            for r in got.itertuples()
        }
        assert len(by_pair) == len(got)  # no duplicate pair rows
        # within-group self rows: (0,0) m=2 -> 1; (10,10) m=3 -> 3;
        # (20,20) m=4 -> 6; shingle-less (30,30) ABSENT despite m=3
        assert by_pair[(0, 0)] == (1.0, 1)
        assert by_pair[(10, 10)] == (1.0, 3)
        assert by_pair[(20, 20)] == (1.0, 6)
        # the weighted cross row between representatives
        est, n_pairs = by_pair[(0, 10)]
        assert n_pairs == 6 and est == round(ja, 6)
        # nothing else: no short-doc rows, no bystander rows
        assert set(by_pair) == {(0, 0), (10, 10), (20, 20), (0, 10)}
