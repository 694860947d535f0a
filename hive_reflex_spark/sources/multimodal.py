"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind ``_decode_payload`` (clearly marked); everything
around it — schema, batch iteration, frame explosion, feature extraction
signature, partitioning — is the real Spark plumbing a production decoder
would drop into (swap ``_decode_payload`` for PIL/ffmpeg and nothing else
changes).

Scale notes: mapInPandas streams Arrow batches — payloads never
materialize on the driver; frame explosion multiplies rows *inside* the
executor before any shuffle; repartition on the id column upstream if
payload sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_reflex_spark.io import corpus_checkpoint, read_table
from hive_reflex_spark.registry import query

FRAME_SIZE = 256  # bytes per fake "frame"
FEATURE_DIM = 8


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, n_bytes): the
    text column UTF-8-encoded as a stand-in media payload."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("application/x-fake-media").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
    )


def _decode_payload(payload: bytes) -> np.ndarray:
    """FAKE DECODER (no codecs in this container): deterministic byte
    array. A real build replaces this one function with PIL/librosa/ffmpeg.
    """
    return np.frombuffer(payload, dtype=np.uint8)


def decode_frames(media: DataFrame, frame_size: int = FRAME_SIZE) -> DataFrame:
    """Frame-sample each payload into fixed-size frames via mapInPandas:
    (doc_id, frame_idx, frame_bytes, checksum). The Arrow batch iterator
    is the real multimodal decode shape — one batch in, many frames out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                for i in range(0, max(len(arr), 1), frame_size):
                    frame = arr[i : i + frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_size)
                    out["frame_bytes"].append(int(len(frame)))
                    out["checksum"].append(int(frame.sum()) if len(frame) else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn, "doc_id long, frame_idx int, frame_bytes int, checksum long"
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim feature vector per payload (the embed step of a
    multimodal pipeline): deterministic byte-histogram features through
    the same mapInPandas shape a real encoder would use."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                hist = np.zeros(dim, dtype="float64")
                if len(arr):
                    np.add.at(hist, arr % dim, 1.0)
                    hist /= len(arr)
                ids.append(doc_id)
                feats.append(hist.tolist())
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return media.mapInPandas(fn, "doc_id long, features array<double>")


def resize_payload(media: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Resize/downsample each decoded payload to a fixed-length vector by
    area mean-pooling — the byte-domain twin of image resize / audio
    resample. Bucket ``j`` of a length-``L`` array covers indices ``i``
    with ``(i * n_buckets) // L == j`` (every bucket within one element
    of equal width), value = mean of the bucket's bytes.

    Same Arrow-batched mapInPandas tier as :func:`decode_frames`; a real
    build swaps ``_decode_payload`` and the pooling becomes
    ``PIL.Image.resize`` / ``scipy.signal.resample`` with nothing else
    changing. Output rows = n_buckets per non-empty payload — bounded
    fan-out, no shuffle introduced.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, buckets, means = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload)).astype("int64")
                size = len(arr)
                if size == 0:
                    continue
                idx = (np.arange(size) * n_buckets) // size
                sums = np.bincount(idx, weights=arr, minlength=n_buckets)
                counts = np.bincount(idx, minlength=n_buckets)
                # emit only non-empty buckets (size < n_buckets leaves
                # gaps in the bucket ids) — the GROUP BY semantics of the
                # oracle; integer sums / integer counts in float64 is
                # bit-identical to SUM()::DOUBLE / COUNT(*)
                used = np.nonzero(counts)[0]
                pooled = sums[used] / counts[used]
                ids.extend([doc_id] * len(used))
                buckets.extend(int(b) for b in used)
                means.extend(pooled.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": buckets, "mean_byte": means}
            )

    return media.mapInPandas(fn, "doc_id long, bucket int, mean_byte double")


@query(
    "q65a_resize_pool",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    pos AS (SELECT doc_id, text, L, unnest(range(1, L+1)) AS p FROM d)
    SELECT doc_id,
           CAST(((p - 1) * 16) // L AS INT) AS bucket,
           CAST(SUM(ascii(substr(text, CAST(p AS INT), 1))) AS DOUBLE)
               / COUNT(*) AS mean_byte
    FROM pos
    GROUP BY 1, 2
    """,
)
def q65a_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize: every payload mean-pooled to a fixed 16-bucket
    vector through the mapInPandas decode tier (`resize_payload`). The
    oracle recomputes the identical pooling byte-by-byte in SQL — exact
    because the fixture text is pure ASCII (1 char = 1 byte)."""
    docs = read_table(spark, sf_dir, "documents")
    return resize_payload(with_binary_payload(docs), n_buckets=16)


@query(
    "q65_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT)
               AS n_frames,
           substr(md5(text), 1, 8) AS content_key
    FROM documents
    """,
)
def q65_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — byte size, frame count at
    256 B/frame, content key — all scan-side expressions; the decode
    itself (frames/features) is the mapInPandas tier, checked in tests."""
    docs = read_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        # long: DuckDB length() is BIGINT; exact arrow-dtype parity
        F.length(payload).cast("long").alias("n_bytes"),
        F.ceil(F.length(payload) / 256.0).cast("long").alias("n_frames"),
        F.substring(F.md5("text"), 1, 8).alias("content_key"),
    )

@query(
    "q163_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    pos AS (SELECT doc_id, text, L, unnest(range(1, L+1)) AS p FROM d)
    SELECT doc_id,
           CAST((p - 1) // 256 AS INT) AS frame_idx,
           CAST(COUNT(*) AS INT) AS frame_bytes,
           CAST(SUM(ascii(substr(text, CAST(p AS INT), 1))) AS BIGINT)
               AS checksum
    FROM pos GROUP BY 1, 2
    """,
)
def q163_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling driven end-to-end: every payload chunked
    into 256-B frames with per-frame byte checksums through the
    mapInPandas decode tier (`decode_frames` — the video/audio
    frame-extraction shape). The oracle recomputes every frame boundary
    and checksum byte-by-byte in SQL (exact: fixture text is pure ASCII);
    frame explosion happens inside the executor before any shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    return decode_frames(with_binary_payload(docs))


@query(
    "q164_media_features",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    pos AS (SELECT doc_id, L,
                   ascii(substr(text, CAST(p AS INT), 1)) % 8 AS j
            FROM (SELECT doc_id, text, L, unnest(range(1, L+1)) AS p
                  FROM d)),
    hist AS (SELECT doc_id, j, COUNT(*) AS c FROM pos GROUP BY 1, 2),
    dims AS (SELECT unnest(range(8)) AS j)
    SELECT d.doc_id, CAST(dims.j AS INT) AS dim,
           ROUND(CAST(COALESCE(hist.c, 0) AS DOUBLE) / d.L, 6) AS feat
    FROM d CROSS JOIN dims
    LEFT JOIN hist ON hist.doc_id = d.doc_id AND hist.j = dims.j
    """,
)
def q164_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction (the embed step): fixed-dim
    byte-histogram features per payload via `extract_features`'s
    mapInPandas encoder signature, exploded to (doc_id, dim, feat) rows
    so the value-hash covers every component including exact zeros. The
    fake decode is the documented stub; the Arrow batching, UDF
    signature, and fan-out shape are the production plumbing."""
    docs = read_table(spark, sf_dir, "documents")
    feats = extract_features(with_binary_payload(docs))
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim", "feat")
    ).select("doc_id", "dim", F.round(F.col("feat"), 6).alias("feat"))


@query(
    "q233_media_dup_families",
    oracle="""
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS L FROM documents),
    pos AS (SELECT doc_id, L, p,
                   CAST(('0x' || substr(hx, 2 * CAST(p AS INT) - 1, 2))
                        AS INT) AS bv
            FROM d, unnest(range(1, L + 1)) AS t(p)),
    pool AS (SELECT doc_id,
                    CAST(((p - 1) * 16) // L AS INT) AS bucket,
                    CAST(FLOOR(CAST(SUM(bv) AS DOUBLE)
                         / COUNT(*) / 8.0 + 0.5) AS BIGINT) AS qv
             FROM pos GROUP BY doc_id, ((p - 1) * 16) // L),
    sig AS (SELECT doc_id,
                   string_agg(CAST(qv AS VARCHAR), '-' ORDER BY bucket)
                       AS sig
            FROM pool GROUP BY doc_id)
    SELECT substr(md5(sig), 1, 12) AS sig_key,
           CAST(COUNT(*) AS BIGINT) AS family_size,
           MIN(doc_id) AS keep_doc,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM sig GROUP BY sig
    """,
)
def q233_media_dup_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup families over MEDIA payloads — the multimodal
    analog of q206's text fingerprint dedup and the thumbnail-hash
    (pHash/dHash-class) pass every image-corpus curation pipeline runs:
    each payload is mean-pooled to the fixed 16-bucket thumbnail
    (`resize_payload`, the mapInPandas decode tier), each bucket mean is
    quantized to 32 levels (an 8-byte step), and the quantized thumbnail IS
    the perceptual signature (resolution tuned on the fixture: 33
    multi-doc families at sf0.01, 434 distinct signatures — coarse
    enough to catch near-dups, fine enough to separate the corpus) — payloads whose signatures collide are one
    family (keep min doc, drop the rest). Re-encoded/trivially-edited
    media land in the same family where exact content hashes (q65's
    content_key) see nothing.

    Engine parity is exact by construction: BOTH engines pool UTF-8
    BYTES (the oracle walks hex(encode(text)) two nibbles at a time —
    a char-based oracle diverges on any non-ASCII document, where byte
    length != char length and byte values != code points), bucket means
    are int-sum / int-count (identical IEEE division), /8.0 is a
    power-of-two divide (EXACT, no rounding), and the +0.5/floor
    half-up happens on identical doubles. Scale: thumbnailing is the linear mapInPandas
    scan; the family rollup groups on a 16-value signature — one
    shuffle keyed by signature, uniform unless the corpus is one giant
    dup family (in which case dedup is the point)."""
    docs = read_table(spark, sf_dir, "documents")
    rp = resize_payload(with_binary_payload(docs), n_buckets=16)
    sig = (
        rp.withColumn(
            "qv", F.floor(F.col("mean_byte") / 8.0 + 0.5).cast("long")
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bucket", "qv"))
                    ),
                    lambda s: s["qv"].cast("string"),
                ),
                "-",
            ).alias("sig")
        )
    )
    return sig.groupBy("sig").agg(
        F.count("*").alias("family_size"),
        F.min("doc_id").alias("keep_doc"),
        (F.count("*") - 1).alias("n_dropped"),
    ).select(
        F.substring(F.md5("sig"), 1, 12).alias("sig_key"),
        "family_size",
        "keep_doc",
        "n_dropped",
    )


# ---------------------------------------------------------------------------
# Hamming-banded perceptual NEAR-dup pairs (q233 catches only exact
# signature collisions; this catches 1-3 bucket edits)
# ---------------------------------------------------------------------------

PH_BANDS = 4  # 16 buckets -> 4 bands of 4
PH_HD_MAX = 3  # verified symbol-Hamming threshold; pigeonhole over 4
# bands GUARANTEES every signature pair at distance <= 3 shares a clean
# band. The near-match signature quantizes at /4.0 (64 levels) — FINER
# than q233's /8.0 equality families: banding needs selectivity, and
# /4.0 is still a binary-exact power-of-two step. Banding runs over
# DISTINCT signatures (exact-equal payloads collapse into q233-style
# families FIRST): on a duplicate-dense corpus the per-doc band join is
# quadratic in bucket size (the same blowup q49a's star dodged), while
# the family universe stays near-constant under duplication.


@query(
    "q278_phash_hamming_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS L FROM documents),
    pos AS (SELECT doc_id, L, p,
                   CAST(('0x' || substr(hx, 2 * CAST(p AS INT) - 1, 2))
                        AS INT) AS bv
            FROM d, unnest(range(1, L + 1)) AS t(p)),
    pool AS (SELECT doc_id,
                    CAST(((p - 1) * 16) // L AS INT) AS bucket,
                    CAST(FLOOR(CAST(SUM(bv) AS DOUBLE)
                         / COUNT(*) / 4.0 + 0.5) AS BIGINT) AS qv
             FROM pos GROUP BY doc_id, ((p - 1) * 16) // L),
    sig AS (SELECT doc_id,
                   string_agg(CAST(qv AS VARCHAR), '-' ORDER BY bucket)
                       AS sig
            FROM pool GROUP BY doc_id),
    fam AS (SELECT sig, MIN(doc_id) AS fam_doc,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM sig GROUP BY sig),
    fpool AS (SELECT pool.doc_id, bucket, qv FROM pool
              JOIN fam ON fam.fam_doc = pool.doc_id),
    bands AS (SELECT doc_id, bucket // {16 // PH_BANDS} AS band,
                     string_agg(CAST(qv AS VARCHAR), '-' ORDER BY bucket)
                         AS band_sig
              FROM fpool GROUP BY doc_id, bucket // {16 // PH_BANDS}),
    cand AS (SELECT DISTINCT a.doc_id AS fam_a, b.doc_id AS fam_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_sig = b.band_sig
                  AND a.doc_id < b.doc_id),
    ham AS (SELECT c.fam_a, c.fam_b,
                   CAST(SUM(CASE WHEN pa.qv <> pb.qv THEN 1 ELSE 0 END)
                        AS BIGINT) AS hamming
            FROM cand c
            JOIN fpool pa ON pa.doc_id = c.fam_a
            JOIN fpool pb ON pb.doc_id = c.fam_b
                         AND pb.bucket = pa.bucket
            GROUP BY c.fam_a, c.fam_b)
    SELECT ham.fam_a, ham.fam_b, ham.hamming,
           fa.n_docs AS docs_a, fb.n_docs AS docs_b
    FROM ham
    JOIN fam fa ON fa.fam_doc = ham.fam_a
    JOIN fam fb ON fb.fam_doc = ham.fam_b
    WHERE ham.hamming <= {PH_HD_MAX}
    """,
)
def q278_phash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded perceptual NEAR-duplicate pairs over media
    payloads — the LSH step of image dedup that exact-signature
    families (q233) skip: exact-equal thumbnails collapse into families
    FIRST (min-doc representative), then the 16-symbol quantized
    signature of each FAMILY splits into {PH_BANDS} bands of
    {16 // PH_BANDS}; families sharing any clean band become
    candidates (pigeonhole: a pair within Hamming {PH_HD_MAX} over 16
    symbols cannot dirty all {PH_BANDS} bands, so banding is LOSSLESS
    at the verified threshold — MinHash banding's guarantee structure,
    but deterministic); candidates verify by exact symbol-Hamming.
    Distinct signatures can't collide at distance 0, so every output
    row is a true NEAR-miss (1..{PH_HD_MAX} bucket edits — the
    re-encode/crop/brighten class), each carrying both families' doc
    counts for drop accounting.

    Scale: the family-first collapse is what survives duplicate-dense
    corpora — per-doc banding is quadratic in bucket size under
    duplication (the q49a star lesson), while the distinct-signature
    universe stays near-constant; band join is O(signature
    collisions), verification touches candidate families' 16-row
    signatures only.

    Reference anchor: q233's thumbnail signature (multimodal decode
    tier), upgraded from equality-families to banded near-match."""
    docs = read_table(spark, sf_dir, "documents")
    rp = resize_payload(with_binary_payload(docs), n_buckets=16)
    # 16 numeric rows per doc, distilled from the payload decode — the
    # §8 "fingerprints only" waist. pool is referenced by the signature
    # aggregate AND the family prune, fpool by the banding plus both
    # verification legs: materialized so the mapInPandas decode runs
    # ONCE instead of per plan reference (r12, guide §3.3/§5)
    # corpus tier (r13): 16 rows per doc — grows with the corpus
    pool = corpus_checkpoint(
        rp.select(
            "doc_id",
            "bucket",
            F.floor(F.col("mean_byte") / 4.0 + 0.5).cast("long").alias("qv"),
        )
    )
    sig = pool.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "qv"))),
                lambda s: s["qv"].cast("string"),
            ),
            "-",
        ).alias("sig")
    )
    fam = sig.groupBy("sig").agg(
        F.min("doc_id").alias("fam_doc"), F.count("*").alias("n_docs")
    )
    fpool = corpus_checkpoint(
        pool.join(
            fam.select(F.col("fam_doc").alias("doc_id")), "doc_id", "semi"
        )
    )
    bands = (
        fpool.withColumn(
            "band", (F.col("bucket") / (16 // PH_BANDS)).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "qv"))),
                    lambda s: s["qv"].cast("string"),
                ),
                "-",
            ).alias("band_sig")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("fam_a"),
            F.col("b.doc_id").alias("fam_b"),
        )
        .distinct()
    )
    pa, pb = fpool.alias("pa"), fpool.alias("pb")
    ham = (
        cand.join(pa, F.col("fam_a") == F.col("pa.doc_id"))
        .join(
            pb,
            (F.col("fam_b") == F.col("pb.doc_id"))
            & (F.col("pa.bucket") == F.col("pb.bucket")),
        )
        .groupBy("fam_a", "fam_b")
        .agg(
            F.sum(
                F.when(F.col("pa.qv") != F.col("pb.qv"), 1).otherwise(0)
            )
            .cast("long")
            .alias("hamming")
        )
        .filter(F.col("hamming") <= PH_HD_MAX)
    )
    fa = fam.select(
        F.col("fam_doc").alias("fam_a"), F.col("n_docs").alias("docs_a")
    )
    fb = fam.select(
        F.col("fam_doc").alias("fam_b"), F.col("n_docs").alias("docs_b")
    )
    return (
        ham.join(fa, "fam_a")
        .join(fb, "fam_b")
        .select("fam_a", "fam_b", "hamming", "docs_a", "docs_b")
    )
