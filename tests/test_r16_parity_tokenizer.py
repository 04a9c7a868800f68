"""Adversarial-corpus parity for bpe1_train_merges / bpe2_encode_corpus
(rows-only: k-round iterative training has no SQL twin).

Branches the shipped corpus never hits, forced here:
- MERGE-DRY corpus: all words single-character, so round 0 finds no
  adjacent pair and `if not best: break` fires — bpe1 must return an
  EMPTY merge table and bpe2 must still encode (token count == char
  count per doc).
- EXACT TIE pair counts: the argmax orders by (count desc, a asc,
  b asc); a corpus with two pairs at identical corpus frequency must
  pick the lexicographically first, and the choice cascades into
  every later round.
- GREEDY OVERLAP runs: 'aaaa'-style words where classical BPE merges
  left-to-right ([aa, aa], then [aaaa] only via the (aa,aa) pair —
  never the overlapping middle (a,a)).
- MULTI-ROUND CASCADE onto merged symbols: merges whose halves are
  themselves merge outputs.
- bpe2's zero-token branch: empty-text and all-spaces docs must
  surface with n_tokens = n_chars = 0 via the left-join coalesce.

Ground truth: an independent pure-Python Sennrich trainer/encoder
(collections.Counter pair counts over the distinct-word vocab,
greedy left-to-right merge application) — written against the BPE
paper semantics, not imported from the module under test.
"""

from __future__ import annotations

from collections import Counter

from tests.parity_util import docs_table, run_registered

BPE_MERGES = 8  # tokenizer.py contract, restated


def _py_train(texts, n_merges=BPE_MERGES):
    """Reference BPE: word-count relation -> [(rank, a, b)] merges and
    the final per-word symbol arrays."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += wc[w]
        if not pairs:
            break
        a, b = min(pairs, key=lambda p: (-pairs[p], p[0], p[1]))
        merges.append((rank, a, b, a + b, pairs[(a, b)]))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def _check_train(spark, tmp_path, rows):
    got = run_registered(
        spark, tmp_path, "bpe1_train_merges", {"documents": docs_table(rows)}
    )
    want, _ = _py_train([t for _, t, _ in rows])
    got_rows = [
        (int(r.rank), r.sym_a, r.sym_b, r.merged, int(r.pair_count))
        for r in got.sort_values("rank").itertuples()
    ]
    assert got_rows == want, (got_rows, want)
    return got_rows


def _check_encode(spark, tmp_path, rows):
    got = run_registered(
        spark, tmp_path, "bpe2_encode_corpus", {"documents": docs_table(rows)}
    ).set_index("doc_id")
    _, vocab = _py_train([t for _, t, _ in rows])
    for doc_id, text, _ in rows:
        words = [w for w in text.split(" ") if w]
        want_tok = sum(len(vocab[w]) for w in words)
        want_chr = sum(len(w) for w in words)
        assert int(got.loc[doc_id, "n_tokens"]) == want_tok, doc_id
        assert int(got.loc[doc_id, "n_chars"]) == want_chr, doc_id


class TestBpe1AdversarialParity:
    def test_merge_dry_corpus(self, spark, tmp_path):
        """Single-character words only: zero pairs in round 0, the
        break fires, and the merge table is empty."""
        rows = [(0, "a b c d", "en"), (1, "e f g a", "en")]
        assert _check_train(spark, tmp_path, rows) == []

    def test_tie_break_cascade(self, spark, tmp_path):
        """'xy' and 'pq' appear with identical corpus counts: the
        (count, a, b) order must pick 'pq' first, and later rounds see
        the vocab with that merge already applied."""
        rows = [
            (0, "xy xy xy pq pq", "en"),
            (1, "pq zz zz zz", "en"),
        ]
        merges = _check_train(spark, tmp_path, rows)
        # pq and xy both occur 3x; zz contributes (z,z) 3x too — all
        # three tie, and ('p','q') < ('x','y') < ('z','z')
        assert merges[0][1:3] == ("p", "q")

    def test_greedy_overlap_and_cascade(self, spark, tmp_path):
        """Runs of a single char: (a,a) on 'aaaa' counts twice via the
        non-overlapping greedy convention... then cascades to (aa,aa)
        and mixed merges whose operands are merged symbols."""
        rows = [
            (0, "aaaa aaaa aaa baa", "en"),
            (1, "aaaa aab baa aa", "en"),
        ]
        _check_train(spark, tmp_path, rows)

    def test_dry_mid_training(self, spark, tmp_path):
        """A corpus that exhausts all pairs BEFORE the 8 rounds: every
        word collapses to one symbol and the break fires mid-loop."""
        rows = [(0, "ab ab cd cd cd", "en"), (1, "ab cd ab", "en")]
        merges = _check_train(spark, tmp_path, rows)
        assert 0 < len(merges) < BPE_MERGES


class TestBpe2AdversarialParity:
    def test_zero_token_docs(self, spark, tmp_path):
        """Empty-text and all-space docs hit the left-join coalesce
        branch: present in the output with 0/0."""
        rows = [
            (0, "hello world hello", "en"),
            (1, "", "en"),
            (2, "   ", "en"),
            (3, "hello", "en"),
        ]
        _check_encode(spark, tmp_path, rows)

    def test_encode_matches_python_end_to_end(self, spark, tmp_path):
        """Tie-heavy, run-heavy corpus: trained vocab quotient totals
        must equal the reference Python trainer+encoder per doc."""
        rows = [
            (0, "aaaa aab pq pq xy", "en"),
            (1, "xy xy zz zz zz baa", "en"),
            (2, "aaaa baa pq", "en"),
        ]
        _check_encode(spark, tmp_path, rows)
