"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; per-item processing (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` so each Python
worker handles a columnar batch of payloads — the pattern that scales to
100 TB of media (payloads never pass through the driver; batch size
bounds worker memory).

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real libjpeg/ffmpeg call would use; the Spark-side plumbing —
schema, batching, partition flow — is real and tested.

``multimodal_bytes`` is the oracle-checkable slice (pure JVM byte ops);
the mapInPandas feature path is pinned by tests/test_multimodal.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstore_spark.tables import table

CHUNK = 256  # bytes per storage chunk in the chunk-count metadata

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("histogram", T.ArrayType(T.IntegerType())),  # 16-bin byte histogram
])


def binary_payloads(spark, sf_dir) -> DataFrame:
    """documents.text re-encoded as an opaque binary payload column —
    the stand-in for an image/audio blob column in the testdata."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def multimodal_bytes(spark, sf_dir) -> DataFrame:
    """Typed metadata over the binary column — pure JVM expressions."""
    p = binary_payloads(spark, sf_dir)
    n = F.col("meta.n_bytes")
    return p.select(
        "doc_id",
        n.alias("byte_len"),
        ((n + CHUNK - 1) / CHUNK).cast("int").alias("n_chunks"),
    )

MULTIMODAL_BYTES_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       CAST((octet_length(encode(text)) + {CHUNK} - 1) // {CHUNK} AS INTEGER) AS n_chunks
FROM documents
"""


def multimodal_dedup_exact(spark, sf_dir) -> DataFrame:
    """Exact binary dedup over the payload column — keep the minimum
    doc_id per distinct blob, count the copies. The bytes themselves
    never shuffle: the groupBy key is the 32-byte sha2 digest, the same
    technique as text dedup_exact (functions/dedup.py) lifted to binary
    payloads — at 100 TB of images this is the first pass before any
    perceptual near-dup (multimodal_neardup below)."""
    p = binary_payloads(spark, sf_dir)
    return (
        p.groupBy(F.sha2("payload", 256).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )

MULTIMODAL_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY encode(text)
"""


def _fake_decode(payload: bytes) -> bytes:
    """STUB for the codec call (no image/audio libs in this container).

    A real deployment replaces this with e.g. PIL.Image.open /
    torchaudio.load; everything around it (Arrow batching, schema,
    partition flow) is unchanged. Deterministic so tests can pin outputs.
    """
    return payload  # identity "decode"


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each executor core pulls columnar batches, runs the
    (vectorizable) Python body, emits columnar batches — payload bytes
    never leave the executor.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(_fake_decode(bytes(payload)), dtype=np.uint8)
                hist = np.bincount(raw >> 4, minlength=16).astype("int32")
                rows.append((
                    int(doc_id),
                    int(raw.size),
                    int(raw.sum()) % (2**31),
                    hist.tolist(),
                ))
            yield pd.DataFrame(rows, columns=["doc_id", "byte_len", "checksum", "histogram"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_features(spark, sf_dir) -> DataFrame:
    return extract_features(binary_payloads(spark, sf_dir))


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),
])


def resize_images(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Image-resize plumbing over binary payloads (Arrow-batched).

    The decode+resample body is the deterministic fake (`_fake_decode` +
    stride sampling standing in for PIL's `Image.resize`); the Spark
    contract — binary in, fixed-shape binary out, schema, batching — is
    exactly what a real thumbnailing pipeline uses at scale.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(_fake_decode(bytes(payload)), dtype=np.uint8)
                # deterministic stride resample to width×height "pixels"
                idx = (np.arange(target) * max(raw.size, 1) // target) % max(raw.size, 1)
                pix = raw[idx] if raw.size else np.zeros(target, dtype=np.uint8)
                rows.append((int(doc_id), width, height, pix.tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "pixels"])

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one input payload fans out to every
    n-th fixed-size 'frame' (a 1→N mapInPandas — the shape a video
    decode-and-sample job has; ffmpeg stands behind `_fake_decode` in a
    real deployment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = _fake_decode(bytes(payload))
                n_frames = max(len(raw) // frame_bytes, 0)
                for i in range(0, n_frames, every_n):
                    rows.append((int(doc_id), i, raw[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("window_idx", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),        # window energy
    T.StructField("zero_cross", T.IntegerType()),  # sign-change count
])


def audio_windows(df: DataFrame, win: int = 256, hop: int = 128) -> DataFrame:
    """Audio feature-window plumbing: payload → overlapping PCM windows
    with per-window RMS + zero-crossing counts (1→N fan-out, Arrow
    batches, vectorized numpy strides — the torchaudio/librosa call
    stands behind `_fake_decode` in a real deployment; here bytes are
    interpreted as centered int16-ish samples, deterministically)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(_fake_decode(bytes(payload)), dtype=np.uint8)
                samples = raw.astype("float64") - 128.0  # fake PCM decode
                n_win = max((samples.size - win) // hop + 1, 0)
                if n_win:
                    idx = np.arange(win)[None, :] + hop * np.arange(n_win)[:, None]
                    w = samples[idx]                      # n_win × win view
                    rms = np.sqrt((w * w).mean(axis=1))
                    zc = (np.diff(np.signbit(w), axis=1) != 0).sum(axis=1)
                    for i in range(n_win):
                        rows.append((int(doc_id), i, float(rms[i]), int(zc[i])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_idx", "rms", "zero_cross"]
            )

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


EXIF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])


def extract_metadata(df: DataFrame) -> DataFrame:
    """EXIF-style metadata extraction plumbing (piexif/hachoir behind
    `_fake_decode` in a real deployment). The fake derives deterministic
    pseudo-tags (dimensions, codec, duration) from the payload bytes so
    tests can pin exact values; output is a map<string,string> column —
    the schema a real tag extractor emits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(_fake_decode(bytes(payload)), dtype=np.uint8)
                h = int(raw[: 64].sum()) if raw.size else 0
                rows.append((int(doc_id), {
                    "width": str(160 + (h % 32) * 16),
                    "height": str(120 + (h % 24) * 16),
                    "codec": ["raw", "rle", "lz"][h % 3],
                    "n_bytes": str(int(raw.size)),
                }))
            yield pd.DataFrame(rows, columns=["doc_id", "meta"])

    return df.mapInPandas(run, schema=EXIF_SCHEMA)


MEDIA_DIM = 64          # fake perceptual-feature dimensionality
MEDIA_NEARDUP_COS = 0.95  # measured gap on testdata: planted near-dup
                          # payloads ≥ 0.994, background p99.9 = 0.74
MEDIA_BANDS = 48
MEDIA_ROWS = 16           # taller bands than the embeddings table's
                          # (high threshold ⇒ high bit-match prob ⇒ a
                          # 16-bit band still recalls ~1.0 while cutting
                          # background candidates ~20×)

EMBED_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("v", T.ArrayType(T.DoubleType())),
])


def media_embeddings(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → (vec_id, v): deterministic "perceptual
    feature" vector per payload — an L2-normalized hashed bigram
    histogram of the fake-decoded bytes (a real deployment puts
    CLIP/CNN features behind the same mapInPandas interface; shape,
    batching and downstream compatibility are identical). Output plugs
    straight into the similarity tier (neardup_lsh_pairs, IVF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                toks = _fake_decode(bytes(payload)).split(b" ")
                h = np.zeros(MEDIA_DIM)
                for a, b in zip(toks, toks[1:]):
                    h[zlib.crc32(a + b" " + b) % MEDIA_DIM] += 1.0
                n = np.linalg.norm(h)
                rows.append((int(doc_id), (h / n if n else h).tolist()))
            yield pd.DataFrame(rows, columns=["vec_id", "v"])

    return df.mapInPandas(run, schema=EMBED_SCHEMA)


def multimodal_neardup(spark, sf_dir, threshold: float = MEDIA_NEARDUP_COS):
    """Near-duplicate media items: payload → feature vector →
    hyperplane-LSH candidate pairs → exact-cosine verify — the image/
    audio dedup composition at 100 TB (payloads never shuffle; only
    (id, band-hash) pairs and candidate ids do). Approximate feature
    pipeline → rows-only driver check; pinned equal to the brute-force
    pairs over the same vectors in tests/test_multimodal.py."""
    from kstore_spark.functions.similarity import neardup_lsh_pairs

    emb = media_embeddings(binary_payloads(spark, sf_dir))
    return neardup_lsh_pairs(emb, threshold,
                             bands=MEDIA_BANDS, rows=MEDIA_ROWS)


QUERIES = {
    "multimodal_bytes": multimodal_bytes,
    "multimodal_neardup": multimodal_neardup,
    # multimodal_features exercises the mapInPandas path; its checksum is
    # SQL-expressible too (sum of utf-8 bytes), oracle below
    "multimodal_features_checksum": lambda spark, sf_dir: multimodal_features(
        spark, sf_dir
    ).select("doc_id", "byte_len", "checksum"),
    "multimodal_dedup_exact": multimodal_dedup_exact,
}

ORACLES = {
    "multimodal_bytes": MULTIMODAL_BYTES_SQL,
    "multimodal_dedup_exact": MULTIMODAL_DEDUP_EXACT_SQL,
    # documents are pure ASCII (verified: octet_length == length for all
    # rows), so per-char ord == per-byte value
    "multimodal_features_checksum": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       CAST(list_sum(list_transform(generate_series(1, length(text)),
                                    i -> ord(text[i]))) % 2147483648 AS BIGINT) AS checksum
FROM documents
""",
}
