"""Adversarial-corpus parity for mm5_image_phash_neardup (rows-only:
the DCT hash is not SQL-expressible).

Branches the shipped corpus never hits, forced here:
- payloads SHORTER than the 256-byte stub image (the zero-pad branch),
  including the EMPTY payload (all-zero image, median tie -> strict >
  gives hash 0);
- payloads LONGER than 256 bytes whose tails differ: the hash must
  ignore everything past byte 256, so equal-prefix docs pair at
  Hamming 0;
- a pair at 1 <= hd <= PHASH_TAU (found by deterministic search over
  single-char edits): the banded pigeonhole join MUST surface it
  (hd <= 3 guarantees a shared 16-bit band);
- pairs beyond tau excluded, non-image kinds (doc_id % 3 != 0)
  excluded entirely.

Ground truth: an independent numpy pHash (DCT-II basis built from the
definition, einsum application, median via np.partition) + a brute-
force all-pairs popcount — the engine's banded join must reproduce
the brute-force hd <= tau pair set EXACTLY.
"""

from __future__ import annotations

import numpy as np

from tests.parity_util import docs_table, run_registered

SIDE, TAU = 16, 3  # multimodal.py mm5 contract, restated


def _phash_ref(payload: bytes) -> int:
    buf = np.zeros(SIDE * SIDE, dtype=np.float64)
    raw = np.frombuffer(payload[: SIDE * SIDE], dtype=np.uint8)
    buf[: len(raw)] = raw
    img = buf.reshape(SIDE, SIDE)
    k = np.arange(SIDE)
    C = np.cos(np.pi * np.outer(k, 2 * k + 1) / (2 * SIDE))
    dct = np.einsum("ij,jk,lk->il", C, img, C)
    block = dct[:8, :8].ravel()[1:]
    med = np.partition(block.copy(), 31)[31]  # lower median of 63
    h = 0
    for v in block:
        h = (h << 1) | int(v > med)
    return h - (1 << 64) if h >= (1 << 63) else h


def _brute_pairs(hashes: dict[int, int]):
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hd = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if hd <= TAU:
                out.add((a, b, hd))
    return out


class TestMm5AdversarialParity:
    def test_pad_truncate_and_banded_recall(self, spark, tmp_path):
        base = "".join(chr(ord("a") + (i * 7) % 26) for i in range(300))
        # deterministic search for a single-char edit INSIDE the first
        # 256 bytes that lands at 1 <= hd <= TAU from base
        hb = _phash_ref(base.encode())
        near = None
        for pos in range(40, 256):
            for ch in "bcdfg":
                cand = base[:pos] + ch + base[pos + 1:]
                hd = bin((hb ^ _phash_ref(cand.encode())) & ((1 << 64) - 1)).count("1")
                if 1 <= hd <= TAU:
                    near = cand
                    break
            if near:
                break
        assert near is not None, "no single-edit neighbor within tau; widen search"
        texts = {
            0: base,                      # >256 bytes: truncation
            3: base[:256] + "TAIL-DIFFERS-ONLY-PAST-256" * 3,  # same prefix
            6: near,                      # planted 1<=hd<=3 neighbor
            9: "",                        # empty payload -> hash 0
            12: "",                       # second empty -> hd 0 pair
            15: "short payload, zero-padded up to the 16x16 image",
            18: "a completely different document about other things entirely "
                * 5,
            # non-images (doc_id % 3 != 0) carrying COPIES of image
            # payloads: must not pair with anything
            1: base,
            5: near,
        }
        rows = [(i, t, "en") for i, t in sorted(texts.items())]
        got = run_registered(
            spark, tmp_path, "mm5_image_phash_neardup",
            {"documents": docs_table(rows)},
        )
        got_pairs = {(int(r.doc_a), int(r.doc_b), int(r.hd)) for r in got.itertuples()}
        want = _brute_pairs(
            {i: _phash_ref(t.encode()) for i, t in texts.items() if i % 3 == 0}
        )
        assert got_pairs == want, (got_pairs, want)
        ids = {d for p in got_pairs for d in p[:2]}
        assert {1, 5} & ids == set()          # non-images excluded
        assert (0, 3, 0) in got_pairs          # truncation: equal prefix
        assert (9, 12, 0) in got_pairs         # empty-payload pair
        assert any(p[:2] == (0, 6) and 1 <= p[2] <= TAU for p in got_pairs)
