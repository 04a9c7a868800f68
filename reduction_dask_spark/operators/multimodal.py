"""Multimodal-column operators (BASELINE.json north-star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The container has no media libraries,
so the *decode* step is stubbed (deterministic byte-level fake behind
``DECODERS``, or NotImplementedError for real codecs) — the Spark-side
plumbing (binary schema, batch iteration, partitioning, UDF signatures)
is real and tested.

The testdata has no binary table, so payloads are materialized
in-query from documents.text via encode() — schema-wise identical to a
real blob column read from parquet.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..caching import pin
from ..registry import query
from ..sources import load_table

N_FEAT = 16          # fake feature-vector width (byte-histogram bins)
FRAME_STRIDE = 64    # bytes per sampled "frame"
N_FRAMES = 4
MM6_DIM_OUT = 64     # mm6 projection width = text-embedding dim


def _mm6_projection() -> list[list[float]]:
    """Deterministic md5-derived N_FEAT×MM6_DIM_OUT alignment head:
    P[i][j] = (md5i('mm6:i:j') % 2001 - 1000)/1000. SINGLE source of
    truth — mm6's Spark expression builds F.lit()s from it and
    _mm6_oracle() reprs it into the SQL, so engine and oracle cannot
    desynchronize."""
    import hashlib

    return [
        [
            (
                int.from_bytes(
                    hashlib.md5(f"mm6:{i}:{j}".encode()).digest()[:4], "big"
                )
                % 2001
                - 1000
            )
            / 1000.0
            for j in range(MM6_DIM_OUT)
        ]
        for i in range(N_FEAT)
    ]


MM6_PROJ = _mm6_projection()

# mm2's feature CTEs (d, feats) — the hex-nibble histogram SQL shared
# VERBATIM by mm2's oracle and _mm6_oracle(), so the decode stand-in
# has exactly one SQL twin. The fake decoder is a 16-bin byte
# histogram over encode(text) and bin index = the byte's HIGH HEX
# NIBBLE (bin width 16), so per-bin counts are pure string ops on
# hex(payload): strip low nibbles with one regexp, then count each
# hex digit via length-minus-replace. Features are count/total —
# integer rationals, bit-exact in both engines. Empty payloads keep
# np.histogram's unnormalized zeros.
MM2_FEATURES_SQL = f"""
        d AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   regexp_replace(hex(encode(text)), '(.).', '\\1', 'g') AS hs,
                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
            FROM documents
        ), feats AS (
            SELECT doc_id, kind,
                   CASE WHEN nb = 0
                        THEN list_transform(range({N_FEAT}), b -> 0.0::DOUBLE)
                        ELSE list_transform(range({N_FEAT}), b ->
                             (nb - length(replace(hs,
                                  substring('0123456789ABCDEF',
                                            CAST(b + 1 AS BIGINT), 1),
                                  '')))::DOUBLE / nb)
                   END AS features
            FROM d
        )
"""


def blob_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, kind, payload binary, n_bytes) — the multimodal schema."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video")).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes"),
    )


# --------------------------------------------------------------- decode

def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: normalized 16-bin
    byte histogram. Replace with PIL/librosa/pyav when available."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=N_FEAT, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float64)


def _fake_decode_batch(payloads: "pd.Series") -> np.ndarray:
    """Whole-batch twin of :func:`_fake_decode` (r15 verdict item 5:
    mm2's ×10 probe was the constant-factor outlier of the reshaped
    group). One pass over the batch's concatenated bytes instead of a
    per-document ``np.histogram`` call: bins are exactly the high
    nibble (256/{N_FEAT} = 16 bytes per bin, right edge exclusive
    below 256 — byte>>4 lands in the same bin np.histogram picks), so
    a single ``np.add.at`` scatter over (doc, byte>>4) reproduces the
    per-doc counts INTEGER-exactly, and counts/total divides to the
    bit-identical float64 features. Parity pinned against the scalar
    decoder in tests (test_r15_oracle_parity + test_sinks)."""
    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    counts = np.zeros((n, N_FEAT), dtype=np.int64)
    if lens.sum():
        arr = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        doc_idx = np.repeat(np.arange(n), lens)
        np.add.at(counts, (doc_idx, arr >> 4), 1)
    totals = np.where(lens == 0, 1, lens).astype(np.float64)
    feats = counts / totals[:, None]
    # empty payloads keep np.histogram's unnormalized zeros
    return feats


def _real_decode(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decode requires PIL/librosa/pyav — not in this "
        "container; wire the codec here and keep the same signature"
    )


DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "fake": _fake_decode,
    "real": _real_decode,
}


@query(
    "mm1_blob_metadata",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    doc="mm1 typed metadata over opaque payloads — the catalog query a "
        "multimodal pipeline filters on before touching bytes "
        "(predicate pushdown on metadata, payload column never read).",
    tags=("multimodal",),
)
def mm1_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blob_table(spark, sf_dir).select("doc_id", "kind", "n_bytes")


def mm2_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, kind, features array<double>) — the array-native decode +
    feature-extract pass consumed by mm6's projection matmul (and any
    API user who wants the vector whole)."""
    blobs = blob_table(spark, sf_dir)
    decode = DECODERS["fake"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode is _fake_decode:  # vectorized whole-batch twin
                feats = _fake_decode_batch(pdf["payload"])
            else:  # a real codec decodes row-at-a-time by nature
                feats = np.stack([decode(bytes(p)) for p in pdf["payload"]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "features": list(feats),
                }
            )

    return blobs.mapInPandas(
        extract, schema="doc_id bigint, kind string, features array<double>"
    )


@query(
    "mm2_feature_extract",
    # r15 rows-only→oracle conversion — see MM2_FEATURES_SQL above
    # (the hex-nibble histogram SQL shared with _mm6_oracle). The
    # registered output exposes the fixed 16-dim vector as 16 scalar
    # DOUBLE columns (f0..f15) rather than one array column: scalar
    # columns are individually prunable at the parquet scan when a
    # consumer selects a feature subset, and every downstream value
    # gate (driver value-hash included) handles flat doubles natively
    # — array-valued outputs were the one shape the driver's hash had
    # never seen (ROADMAP r15 caveat, now moot for this query).
    oracle=(
        f"WITH {MM2_FEATURES_SQL} SELECT doc_id, kind, "
        + ", ".join(f"features[{i + 1}] AS f{i}" for i in range(N_FEAT))
        + " FROM feats"
    ),
    doc="mm2 decode + feature-extract via mapInPandas: Arrow-batched "
        "binary in, fixed-width float vector out (one scalar column "
        "per feature dim). At scale this is the GPU-adjacent stage — "
        "partition-parallel, no shuffle; the decoder is per-batch "
        "vectorized Python.",
    tags=("multimodal",),
)
def mm2_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = mm2_feature_vectors(spark, sf_dir)
    return vecs.select(
        "doc_id",
        "kind",
        *[F.col("features")[i].alias(f"f{i}") for i in range(N_FEAT)],
    )


def mm3_frame_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_idx, frame binary) — the binary-native frame
    sampler a video pipeline consumes directly."""
    blobs = blob_table(spark, sf_dir).filter(F.col("kind") == "video")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(N_FRAMES):
                    start = i * FRAME_STRIDE
                    if start >= len(raw):
                        break
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(raw[start : start + FRAME_STRIDE])
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return blobs.mapInPandas(frames, schema="doc_id bigint, frame_idx int, frame binary")


@query(
    "mm3_frame_sample",
    # r15 rows-only→oracle conversion: the payload is encode(text)
    # and frames are byte slices, both expressible in DuckDB. BLOBs
    # have no substring there, so the slice runs on the hex encoding
    # (2 chars per byte — byte-exact for ANY input, not just ASCII).
    # The registered output carries the frame as that HEX WITNESS
    # (frame_hex) rather than a BLOB: byte-exact and losslessly
    # invertible (unhex), but a flat string every value gate — the
    # driver's hash included — handles natively; binary outputs were,
    # like arrays, a shape the driver's hash has never seen
    # (mm3_frame_bytes keeps the binary form for API use). Mirrors
    # blob_table's kind rule (video = doc_id % 3 == 2) and
    # FRAME_STRIDE/N_FRAMES = 64/4.
    oracle="""
        WITH vids AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS nb
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT v.doc_id,
               CAST(i AS INTEGER) AS frame_idx,
               substring(v.hx, CAST(i*128 + 1 AS BIGINT), 128) AS frame_hex
        FROM vids v, range(4) t(i)
        WHERE i*64 < v.nb
    """,
    doc="mm3 frame sampling: one payload row → N frame rows (stride "
        "byte-slices standing in for video frames). The explode-shaped "
        "mapInPandas pattern — output cardinality > input — used by "
        "any video pipeline. Registered schema: (doc_id, frame_idx, "
        "frame_hex) where frame_hex is the frame bytes hex-encoded; "
        "mm3_frame_bytes returns the binary (doc_id, frame_idx, "
        "frame) form.",
    tags=("multimodal",),
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm3_frame_bytes(spark, sf_dir).select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


# --------------------------------------------------------------- resize

THUMB_BYTES = 32     # fake thumbnail size (byte-subsample stand-in)


def _fake_resize(payload: bytes, out_bytes: int = THUMB_BYTES) -> bytes:
    """Deterministic stand-in for an image resize: evenly-strided byte
    subsample down to out_bytes (shape change is what matters — swap in
    PIL's Image.resize keeping the same bytes→bytes signature)."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    if len(raw) <= out_bytes:
        return bytes(raw)
    idx = np.linspace(0, len(raw) - 1, out_bytes).astype(np.int64)
    return bytes(raw[idx])


def mm4_thumbnail_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, thumb binary, thumb_bytes, orig_bytes) — the
    binary-native resize pass an image pipeline sinks directly."""
    blobs = blob_table(spark, sf_dir).filter(F.col("kind") == "image")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [_fake_resize(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                    "orig_bytes": pdf["n_bytes"],
                }
            )

    return blobs.mapInPandas(
        resize,
        schema="doc_id bigint, thumb binary, thumb_bytes bigint, orig_bytes bigint",
    )


@query(
    "mm4_resize_thumbnail",
    # r15 rows-only→oracle conversion: _fake_resize's evenly-strided
    # byte subsample is np.linspace(0, nb-1, 32) truncated to int64 —
    # reproducible in SQL as trunc(k*((nb-1)/31.0)) (same IEEE double
    # ops) EXCEPT the endpoint, which numpy pins to exactly nb-1
    # (linspace sets y[-1] = stop), hence the k = 31 CASE. Byte
    # extraction/assembly rides the hex trick (2 chars per byte,
    # byte-exact for any payload; BLOBs have no substring/concat-agg
    # in DuckDB), and the registered output keeps the thumbnail as
    # that HEX WITNESS (thumb_hex) — byte-exact, losslessly
    # invertible, and a flat string the driver's value-hash handles
    # natively, unlike BLOBs which it has never seen
    # (mm4_thumbnail_bytes keeps the binary form for API use).
    # kind rule: image = doc_id % 3 == 0.
    oracle="""
        WITH imgs AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS nb
            FROM documents WHERE doc_id % 3 = 0
        ),
        sel AS (
            SELECT i.doc_id, i.nb, k,
                   substring(i.hx, 2*(CASE WHEN k = 31 THEN i.nb - 1
                       ELSE CAST(trunc(k * ((i.nb - 1) / 31.0)) AS BIGINT)
                   END) + 1, 2) AS hb
            FROM imgs i, range(32) t(k) WHERE i.nb > 32
        ),
        big AS (
            SELECT doc_id, string_agg(hb, '' ORDER BY k) AS thumb_hex,
                   CAST(32 AS BIGINT) AS thumb_bytes, max(nb) AS orig_bytes
            FROM sel GROUP BY doc_id
        ),
        small AS (
            SELECT doc_id, hx AS thumb_hex, CAST(nb AS BIGINT) AS thumb_bytes,
                   nb AS orig_bytes
            FROM imgs WHERE nb <= 32
        )
        SELECT doc_id, thumb_hex, thumb_bytes, CAST(orig_bytes AS BIGINT) AS orig_bytes
        FROM big
        UNION ALL
        SELECT doc_id, thumb_hex, thumb_bytes, CAST(orig_bytes AS BIGINT) AS orig_bytes
        FROM small
    """,
    doc="mm4 resize/thumbnail via mapInPandas: binary in → smaller "
        "binary out plus updated size metadata, image rows only "
        "(metadata filter prunes before any byte is touched). The "
        "payload-rewriting pattern every image pipeline needs — "
        "partition-parallel, no shuffle, output strictly smaller than "
        "input so the stage SHRINKS the dataset (at 100 TB the "
        "thumbnail sink is ~out/in of the source bytes). Registered "
        "schema: (doc_id, thumb_hex, thumb_bytes, orig_bytes) with "
        "thumb_hex the thumbnail bytes hex-encoded (thumb_bytes still "
        "counts BYTES, half the hex length); mm4_thumbnail_bytes "
        "returns the binary thumb form.",
    tags=("multimodal",),
)
def mm4_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm4_thumbnail_bytes(spark, sf_dir).select(
        "doc_id",
        F.hex("thumb").alias("thumb_hex"),
        "thumb_bytes",
        "orig_bytes",
    )


# ---------------------------------------------------------------- mm5

PHASH_SIDE = 16      # stub "image" side: first 256 payload bytes as 16x16
PHASH_BITS = 64      # 8x8 low-frequency DCT block, DC excluded + pad bit
PHASH_BANDS = 4      # 16-bit pigeonhole bands => guaranteed recall hd <= 3
PHASH_TAU = 3


def phash64(payload: bytes) -> int:
    """Perceptual hash of the stub-decoded image: first 256 bytes as a
    16x16 grayscale, 2-D DCT-II, top-left 8x8 coefficient block minus
    the DC term thresholded at its median -> 63 bits (+1 pad) packed
    into a signed 64-bit int. Deterministic; swap the byte-reshape for
    a real luma plane when a codec is wired into DECODERS."""
    arr = np.frombuffer(payload[: PHASH_SIDE * PHASH_SIDE], dtype=np.uint8).astype(
        np.float64
    )
    if len(arr) < PHASH_SIDE * PHASH_SIDE:
        arr = np.pad(arr, (0, PHASH_SIDE * PHASH_SIDE - len(arr)))
    img = arr.reshape(PHASH_SIDE, PHASH_SIDE)
    # separable DCT-II via the explicit cosine basis (no scipy in-container)
    n = PHASH_SIDE
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct = basis @ img @ basis.T
    block = dct[:8, :8].ravel()[1:]          # drop DC
    bits = (block > np.median(block)).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return int(h.astype(np.int64))           # signed 64-bit for Spark


@query(
    "mm5_image_phash_neardup",
    oracle=None,  # DCT is not SQL-expressible; numpy end-to-end parity test
    doc="mm5 perceptual-hash image near-dup: the multimodal sibling of "
        "dd4 — pHash (DCT low-frequency signs) computed per image in "
        "ONE Arrow-batched mapInPandas pass, then the SimHash banded "
        "pigeonhole join on the 64-bit hashes: 4x16-bit bands "
        "guarantee recall for Hamming distance <= 3, candidates are "
        "verified with codegen bit_count(a XOR b) — everything after "
        "the hash UDF is JVM-side and O(corpus + candidates), never "
        "O(n^2). The standard near-duplicate image detection shape "
        "(resized/re-encoded copies share low-frequency structure); "
        "with a real codec only the decode line changes. Pinned by a "
        "numpy end-to-end parity test (hashes AND pair set).",
    tags=("multimodal", "dedup"),
)
def mm5_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = blob_table(spark, sf_dir).filter(F.col("kind") == "image")

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ph": [phash64(bytes(p)) for p in pdf["payload"]],
                }
            )

    hashed = pin(blobs.mapInPandas(hash_batch, schema="doc_id bigint, ph bigint"))
    band_w = PHASH_BITS // PHASH_BANDS
    bands = hashed.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.shiftrightunsigned("ph", b * band_w)
                        .bitwiseAND(F.lit((1 << band_w) - 1))
                        .alias("bkey"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "ph", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ph").alias("pha"),
            F.col("b.ph").alias("phb"),
        )
        .distinct()
    )
    hd = F.bit_count(F.col("pha").bitwiseXOR(F.col("phb")))
    return cand.select("doc_a", "doc_b", hd.cast("int").alias("hd")).filter(
        F.col("hd") <= PHASH_TAU
    )


# ---------------------------------------------------------------- mm6

MM6_TAU = 0.0  # alignment threshold on the standardized score


@query(
    "mm6_crossmodal_alignment",
    oracle=None,  # assigned post-registration: _mm6_oracle() below (r15)
    doc="mm6 cross-modal alignment filtering — the CLIP-score shape "
        "that curates paired image/text corpora (LAION's central "
        "filter: drop pairs whose image and caption embeddings don't "
        "agree): mm2's media feature vectors (decode stand-in) are "
        "projected into the text-embedding space by a DETERMINISTIC "
        "md5-derived projection matrix (the stand-in for a trained "
        "alignment head — KBs, broadcast), scored by cosine against "
        "the paired text embedding (doc_id = vec_id), standardized "
        "corpus-wide (one 1-row moment broadcast), and thresholded. "
        "Plan: one mapInPandas decode pass, one broadcast matmul "
        "expression per row, one equi-join on the pair key, one "
        "moment aggregate — no shuffle beyond the pair join at any "
        "scale. Output: (doc_id, align_z, keep); exact DuckDB oracle "
        "(_mm6_oracle: left-fold dot products replicated by "
        "list_reduce) + numpy end-to-end parity test.",
    tags=("multimodal", "similarity", "pipeline"),
)
def mm6_crossmodal_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = mm2_feature_vectors(spark, sf_dir).select("doc_id", "features")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("tv"),
    )
    dim_out = MM6_DIM_OUT
    proj = MM6_PROJ  # single source of truth, shared with _mm6_oracle
    pcols = F.array(*[
        F.aggregate(
            F.zip_with(
                "features",
                F.array(*[F.lit(proj[i][j]) for i in range(N_FEAT)]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for j in range(dim_out)
    ])
    projected = feats.select("doc_id", pcols.alias("mv"))
    dot = lambda a, b: F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    # zero-norm guard (r15 ADVICE): an empty payload yields an all-zero
    # feature vector, making cos 0/0 — Spark would emit NaN but DuckDB
    # NULLs division by zero, so the engines would diverge ON THE MOMENTS
    # (Spark avg propagates NaN, DuckDB avg skips NULL). NULL the cos in
    # BOTH engines instead: NULL rows are moment-excluded identically and
    # surface as NULL align_z/keep.
    denom = F.sqrt(dot(F.col("mv"), F.col("mv"))) * F.sqrt(dot(F.col("tv"), F.col("tv")))
    joined = projected.join(emb, "doc_id").select(
        "doc_id",
        F.when(denom != 0.0, dot(F.col("mv"), F.col("tv")) / denom).alias("cos"),
    )
    mo = joined.agg(F.avg("cos").alias("mu"), F.stddev_samp("cos").alias("sd"))
    return joined.crossJoin(F.broadcast(mo)).select(
        "doc_id",
        F.round(((F.col("cos") - F.col("mu")) / F.col("sd")), 6).alias("align_z"),
        (((F.col("cos") - F.col("mu")) / F.col("sd")) > MM6_TAU).alias("keep"),
    )


def _mm6_oracle() -> str:
    """r15 rows-only→oracle conversion: mm6 is pure Spark-SQL
    expression work on top of mm2's (now oracle-covered) features —
    every dot product is a LEFT FOLD (F.aggregate), replicated
    bit-for-bit by list_reduce over the same element order, and the
    projection matrix is a deterministic md5-derived literal baked
    into the SQL (repr() doubles round-trip exactly through DuckDB's
    DECIMAL→DOUBLE literal path). The corpus moments (avg/stddev_samp)
    are the one non-structural piece — exact-equality is pinned
    empirically at all three scales by tools/compare.py, like every
    float-sum oracle in this registry. Features come from the SHARED
    MM2_FEATURES_SQL fragment and the matrix from the shared MM6_PROJ
    constant (r15 review: one definition each, no drift). A cos is
    emitted only for {MM6_DIM_OUT}-dim embeddings — Spark's zip_with
    NULL-pads mismatched lengths into a NULL cos, mirrored by the
    len(tv) guard — and only for nonzero-norm vectors on BOTH sides
    (0/0 would be NaN in Spark but NULL in DuckDB, and the NaN would
    poison Spark's corpus moments while DuckDB's avg skipped the NULL;
    both engines now NULL the cos, which the moments skip identically)."""
    dim_out = MM6_DIM_OUT
    proj_lit = (
        "["
        + ",".join(
            "[" + ",".join(repr(v) for v in row) + "]" for row in MM6_PROJ
        )
        + "]"
    )
    fold = (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(range({n}), i -> {a}[i + 1] * {b}[i + 1])), "
        "(acc, x) -> acc + x)"
    )
    dot_mv_tv = fold.format(n=dim_out, a="mv", b="tv")
    dot_mv_mv = fold.format(n=dim_out, a="mv", b="mv")
    dot_tv_tv = fold.format(n=dim_out, a="tv", b="tv")
    return f"""
        WITH {MM2_FEATURES_SQL},
        pm AS (SELECT {proj_lit}::DOUBLE[][] AS p),
        projected AS (
            SELECT doc_id,
                   list_transform(range({dim_out}), j ->
                       list_reduce(
                           list_prepend(0.0::DOUBLE,
                               list_transform(range({N_FEAT}), i ->
                                   features[i + 1] * p[i + 1][j + 1])),
                           (acc, x) -> acc + x)) AS mv
            FROM feats, pm
        ),
        joined AS (
            SELECT pr.doc_id,
                   CASE WHEN len(tv) = {dim_out}
                             AND {dot_mv_mv} > 0 AND {dot_tv_tv} > 0 THEN
                       {dot_mv_tv}
                       / (sqrt({dot_mv_mv}) * sqrt({dot_tv_tv}))
                   END AS cos
            FROM projected pr
            JOIN (SELECT vec_id AS doc_id,
                         list_transform(embedding, x -> x::DOUBLE) AS tv
                  FROM embeddings) e USING (doc_id)
        ),
        z AS (
            SELECT doc_id, cos,
                   avg(cos) OVER () AS mu,
                   stddev_samp(cos) OVER () AS sd
            FROM joined
        )
        SELECT doc_id,
               round((cos - mu) / sd, 6) AS align_z,
               ((cos - mu) / sd) > {MM6_TAU} AS keep
        FROM z
    """


from ..registry import REGISTRY as _REG  # noqa: E402

_REG["mm6_crossmodal_alignment"].oracle = _mm6_oracle()
